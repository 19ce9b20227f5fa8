from .boxes import (bbox_iou, box_iou_matrix, xywh2xyxy, xyxy2xywh, ltwh2xyxy,
                    xyxy2ltwh, clip_boxes, scale_boxes, scale_coords)
from .anchors import make_anchors, dist2bbox, bbox2dist, dfl_decode
from .nms import non_max_suppression
from .dark_channel import dark_channel, atmospheric_light, dark_channel_priors
from .degrade import lowlight_degrade
from .letterbox import letterbox_params, letterbox_jax

__all__ = [
    "bbox_iou", "box_iou_matrix", "xywh2xyxy", "xyxy2xywh", "ltwh2xyxy", "xyxy2ltwh",
    "clip_boxes", "scale_boxes", "scale_coords", "make_anchors", "dist2bbox", "bbox2dist", "dfl_decode",
    "non_max_suppression", "dark_channel", "atmospheric_light", "dark_channel_priors",
    "lowlight_degrade", "letterbox_params", "letterbox_jax",
]
