from cet_pick_tpu.models.unet import UNet2D
from cet_pick_tpu.models.detector import TomoPickNet, create_detector
