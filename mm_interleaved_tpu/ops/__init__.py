from .ms_deform_attn import ms_deform_attn
from .pos_embed import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    resize_abs_pos_embed,
)
from .rmsnorm import rms_norm
from .rotary import apply_rotary_embedding, rotary_cos_sin
from .attention import dot_product_attention

__all__ = [
    "ms_deform_attn",
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "resize_abs_pos_embed",
    "rms_norm",
    "apply_rotary_embedding",
    "rotary_cos_sin",
    "dot_product_attention",
]
