from vtp_tpu.ops.rope import (
    rope_periods_init,
    rope_sincos,
    rope_rotate_half,
    rope_apply,
    apply_rope_with_prefix,
)
from vtp_tpu.ops.norms import rms_norm, layer_norm
from vtp_tpu.ops.activations import quick_gelu, gelu_exact
from vtp_tpu.ops.ffn import swiglu_hidden_dim, swiglu, mlp
from vtp_tpu.ops.attention import sdpa
from vtp_tpu.ops.ring_attention import ring_attention
from vtp_tpu.ops.patchify import patchify, pixel_shuffle, patch_tokens_to_4d

__all__ = [
    "rope_periods_init",
    "rope_sincos",
    "rope_rotate_half",
    "rope_apply",
    "apply_rope_with_prefix",
    "rms_norm",
    "layer_norm",
    "quick_gelu",
    "gelu_exact",
    "swiglu_hidden_dim",
    "swiglu",
    "mlp",
    "sdpa",
    "ring_attention",
    "patchify",
    "pixel_shuffle",
    "patch_tokens_to_4d",
]
