from .image import (
    ImageTransformConfig,
    PrismaticImageTransform,
    apply_image_transform,
    pil_resize,
    pil_resize_exact,
)
from .linear import dequantize_weight, is_quantized, matmul_t, quantize_params, quantize_weight

__all__ = [
    "ImageTransformConfig",
    "PrismaticImageTransform",
    "apply_image_transform",
    "dequantize_weight",
    "is_quantized",
    "matmul_t",
    "pil_resize",
    "pil_resize_exact",
    "quantize_params",
    "quantize_weight",
]
