"""FP8 numerics: formats, QTensor, recipes, delayed scaling, quantized dots."""
from .formats import Format, E4M3, E5M2, E8M0, INT8, INT4, format_by_name
from .qtensor import QTensor, quantize, quantize_mx, dequantize, compute_scale, MX_BLOCK
from .recipe import (
    Recipe,
    RecipeSet,
    DELAYED_E4M3,
    DELAYED_HYBRID,
    MXFP8,
    LAYERWISE,
    UNIFORM_HYBRID,
    MXFP8_SET,
    INT8_WEIGHTS,
    INT4_WEIGHTS,
    INT8_TRAIN,
    BF16_SET,
    recipe_set_by_name,
)
from .delayed import ScaleState, init_scale_state, observe_amax, current_scale
from .dot import qdot, fp8_dot, DotAmaxes

__all__ = [
    "Format", "E4M3", "E5M2", "E8M0", "INT8", "INT4", "format_by_name",
    "QTensor", "quantize", "quantize_mx", "dequantize", "compute_scale", "MX_BLOCK",
    "Recipe", "RecipeSet", "DELAYED_E4M3", "DELAYED_HYBRID", "MXFP8",
    "LAYERWISE", "UNIFORM_HYBRID", "MXFP8_SET", "INT8_WEIGHTS",
    "INT4_WEIGHTS", "INT8_TRAIN",
    "BF16_SET",
    "recipe_set_by_name",
    "ScaleState", "init_scale_state", "observe_amax", "current_scale",
    "qdot", "fp8_dot", "DotAmaxes",
]
