from cet_pick_tpu.eval.matching import match_coordinates
from cet_pick_tpu.eval.metrics import precision_recall_curve, evaluate_detections

__all__ = ["match_coordinates", "precision_recall_curve", "evaluate_detections"]
