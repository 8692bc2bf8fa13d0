from cet_pick_tpu.io.mrc import read_mrc, write_mrc
from cet_pick_tpu.io.loader import (
    quantize,
    load_rec,
    preprocess,
    load_tomos_from_list,
    load_tomo_all_and_angles_from_list,
    load_tlt,
)
from cet_pick_tpu.io.coords import (
    read_coord_table,
    coordinates_table_to_dict,
    match_coordinates_to_images,
    convert_coord_order,
)
