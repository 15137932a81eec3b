from .heatmap import make_heatmaps
from .losses import masked_mse, wbce, wbce_from_logits

__all__ = ["make_heatmaps", "wbce", "wbce_from_logits", "masked_mse"]
