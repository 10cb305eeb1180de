"""Int8 weight quantization for serving (W8A8, dynamic activations).

TPU-native analogue of the reference's int8 linear replacement hooks
(models/utils/text_utils.py:86-110, which delegate to
bitsandbytes-style modules on CUDA): kernels are quantized per-output-
channel to symmetric int8 with fp32 scales; matmuls run int8 x int8 ->
int32 on the MXU (measured ~2x the bf16 dot rate on v5e — PERF.md
round 3) with inputs dynamically quantized per-row, then rescaled.

The quantized tree drops straight into the existing forwards:
``ops.ffn.linear`` dispatches on the ``{"q", "scale", "bias"}`` form,
so ``vit_forward_features`` (and anything else built on ``linear``)
runs quantized when handed quantized params — there is no separate
int8 model implementation to keep in sync.

Quality note: int8 inference shifts metrics; the parity protocol stays
bf16/fp32. This is the serving-throughput option (encode / feature
extraction, e.g. the reference's DiT latent-extraction pipeline,
generation/tools/extract_features_vtp.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jax.Array) -> dict:
    """``(..., in, out)`` fp -> {q: int8 same shape, scale: fp32 (..., out)}.

    Symmetric per-output-channel; leading axes (e.g. the stacked depth
    axis of scan/unroll block params) quantize independently, so slicing
    layer ``i`` off a stacked quantized tree yields exactly the tree
    ``quantize_kernel`` would produce for that layer alone."""
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def int8_linear(x: jax.Array, qk: dict, bias=None) -> jax.Array:
    """Dynamic per-row activation quantization + int8 MXU matmul.
    x: (..., in) fp; returns fp32 (..., out)."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    row_amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    row_scale = row_amax / 127.0
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qk["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_scale * qk["scale"][None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.reshape(*shape[:-1], -1)


def quantize_matmul_params(
    params: Any,
    exclude: Optional[Callable[[str], bool]] = None,
) -> Any:
    """Replace every linear ``{kernel, bias}`` in a param tree with its
    int8 form ``{q, scale, bias}``. ``ops.ffn.linear`` consumes both
    forms transparently.

    ``exclude(key)`` skips subtrees by dict key. The default skips the
    consumers that read ``["kernel"]`` directly instead of going through
    ``linear`` (patch_embed's reshape-GEMM, the feature bottleneck) —
    they carry a negligible share of encode FLOPs."""
    if exclude is None:
        exclude = lambda k: k in ("patch_embed", "feature_bottleneck")

    def visit(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) >= 2:
                out = quantize_kernel(node["kernel"])
                out["bias"] = node.get("bias")
                return out
            return {k: (v if exclude(k) else visit(v)) for k, v in node.items()}
        return node

    return visit(params)
