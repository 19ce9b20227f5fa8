from .tal import task_aligned_assign, select_candidates_in_gts, AssignResult
from .detection import detection_loss, LossItems

__all__ = ["task_aligned_assign", "select_candidates_in_gts", "AssignResult",
           "detection_loss", "LossItems"]
