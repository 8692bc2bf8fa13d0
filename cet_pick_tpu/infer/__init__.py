from cet_pick_tpu.infer.tiled import TiledHeatmapInference
from cet_pick_tpu.infer.detector import TomoDetector

__all__ = ["TiledHeatmapInference", "TomoDetector"]
