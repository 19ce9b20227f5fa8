from . import layers, enhance, heads, graph
from .graph import DetectionModel, parse_model

__all__ = ["layers", "enhance", "heads", "graph", "DetectionModel", "parse_model"]
