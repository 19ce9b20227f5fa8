from .dataset import YOLODataset, check_det_dataset, img2label_path, verify_label
from .loader import DataLoader, collate
from .augment import TrainTransforms, ValTransforms, letterbox, Sample
from .voc import convert_voc_to_yolo
from .coco import convert_coco

__all__ = ["YOLODataset", "check_det_dataset", "img2label_path", "verify_label",
           "DataLoader", "collate", "TrainTransforms", "ValTransforms",
           "letterbox", "Sample", "convert_voc_to_yolo", "convert_coco"]
