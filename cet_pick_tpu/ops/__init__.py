from cet_pick_tpu.ops.heatmap import (
    gaussian_radius,
    gaussian3d,
    gaussian3d_discrete,
    draw_gaussian_3d,
    build_heatmap,
)
from cet_pick_tpu.ops.nms import nms3d, nms3d_xy, nms3d_z, sigmoid_clamped
from cet_pick_tpu.ops.decode import topk_3d, tomo_decode, decode_detections
from cet_pick_tpu.ops.greedy_nms import greedy_nms_3d
from cet_pick_tpu.ops.dog import dog_response, dog_candidates_pyramid
