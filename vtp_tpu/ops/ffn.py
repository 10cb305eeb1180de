"""Feed-forward networks (behavioral reference: vtp/models/layers/ffn.py).

These take param dicts with JAX-convention kernels ``(in, out)``
(transposed from torch's ``(out, in)``) so matmuls hit the MXU directly.
Inputs are cast to ``compute_dtype`` at each GEMM boundary, mirroring
torch autocast; elementwise activations run in the compute dtype.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def swiglu_hidden_dim(in_features: int, ffn_ratio: float, align_to: int = 8) -> int:
    """Hidden-size rule from ffn.py:71-72: ``align(2/3 * ratio * dim)``."""
    hidden = int(in_features * ffn_ratio)
    d = int(hidden * 2 / 3)
    return d + (-d % align_to)


def ffn_align_to(ffn_layer: str) -> int:
    """swiglu / swiglu32 / swiglu64 / swiglu128 registry
    (vision_transformer.py:22-28)."""
    return {"swiglu": 8, "swiglu32": 32, "swiglu64": 64, "swiglu128": 128}[ffn_layer]


def _linear(x: jax.Array, p: dict, compute_dtype: Optional[jnp.dtype]) -> jax.Array:
    if "q" in p:
        # int8-quantized kernel (utils/quantization.quantize_matmul_params):
        # dynamic per-row activation quant + int8 MXU matmul. Every forward
        # that reaches a linear through this function runs quantized when
        # handed a quantized param tree — no separate int8 model code.
        from vtp_tpu.utils.quantization import int8_linear

        y = int8_linear(x, p, p.get("bias"))
        return y.astype(compute_dtype) if compute_dtype is not None else y
    kernel = p["kernel"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = x @ kernel
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


linear = _linear


def _constrain_hidden(h: jax.Array) -> jax.Array:
    """Pin the up-projection output to the Megatron layout (batch over
    ``data``, hidden features over ``model``) under an ambient mesh —
    GSPMD propagation through the scan/remat backward otherwise loses
    it and replicates the (rows, hidden) activations (VERDICT r3)."""
    from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from vtp_tpu.parallel.sharding import maybe_constrain

    return maybe_constrain(h, DATA_AXIS, *(None,) * (h.ndim - 2), MODEL_AXIS)


def swiglu(x: jax.Array, params: dict, compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """SwiGLU: ``w3(silu(w1 x) * w2 x)`` (ffn.py:77-81).

    When the params carry a fused ``w12`` (see
    vtp_tpu.utils.params.fuse_ffn_params) the two up-projections run as
    one GEMM — numerically identical, one input read instead of two."""
    if "w12" in params:
        h12 = _linear(x, params["w12"], compute_dtype)
        x1, x2 = jnp.split(h12, 2, axis=-1)
    else:
        x1 = _constrain_hidden(_linear(x, params["w1"], compute_dtype))
        x2 = _constrain_hidden(_linear(x, params["w2"], compute_dtype))
    return _linear(jax.nn.silu(x1) * x2, params["w3"], compute_dtype)


def mlp(
    x: jax.Array,
    params: dict,
    act: Callable[[jax.Array], jax.Array],
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Standard 2-layer MLP (ffn.py:21-48)."""
    h = act(_constrain_hidden(_linear(x, params["fc1"], compute_dtype)))
    return _linear(h, params["fc2"], compute_dtype)
