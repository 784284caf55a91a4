from .attention import dot_product_attention
from .resize import resize_bilinear, resize_nearest

__all__ = ["dot_product_attention", "resize_bilinear", "resize_nearest"]
