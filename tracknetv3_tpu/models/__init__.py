from .factory import get_model
from .inpaintnet import InpaintNet
from .tracknet import TrackNet

__all__ = ["get_model", "TrackNet", "InpaintNet"]
