"""Latent diffusion transformer (LightningDiT-class) in JAX.

The reference trains its generative stage with the external LightningDiT
submodule (declared but not vendored — SURVEY.md section 1.7/2.7); the
shipped configs (generation/configs/train_vtp_l_dit_xl.yaml) specify
LightningDiT-XL/1 on f16d64 latents: patch size 1, adaLN-zero
conditioning, and the modernized block recipe (RMSNorm + SwiGLU + 2D
RoPE). This module provides a TPU-native equivalent so the full
latents -> DiT -> gFID pipeline runs inside this framework.

Blocks are stacked and scanned like the other towers; adaLN modulation
tensors are computed once from the conditioning embedding per block
(inside the scan, from per-layer params).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from vtp_tpu.models.initializers import normal, trunc_normal
from vtp_tpu.ops.attention import sdpa
from vtp_tpu.ops.ffn import linear, swiglu_hidden_dim
from vtp_tpu.ops.norms import rms_norm
from vtp_tpu.ops.rope import rope_periods_init, rope_sincos


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 16           # latent grid (f16d64 at 256px)
    patch_size: int = 1
    in_channels: int = 64
    dim: int = 1152
    depth: int = 28
    num_heads: int = 16
    ffn_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    rope_base: float = 100.0
    use_qk_norm: bool = True
    norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def tokens_per_side(self) -> int:
        return self.input_size // self.patch_size

    @property
    def token_dim(self) -> int:
        return self.in_channels * self.patch_size**2

    @property
    def ffn_hidden(self) -> int:
        return swiglu_hidden_dim(self.dim, self.ffn_ratio, 8)

    @property
    def null_label(self) -> int:
        return self.num_classes  # extra row for classifier-free guidance


# XL uses 18 heads (head_dim 64) rather than LightningDiT's 16
# (head_dim 72): at fixed dim the qkv/proj/mlp shapes and parameter
# count are identical, but head_dim 64 hits the fused Pallas
# qkv+rope+attention kernels, while 72 falls back to an XLA path that
# lowers the (256,256,72) dots onto the VPU with fp32 score
# materialization — measured 22.6 ms of a 65.1 ms DiT-XL/1 euler step
# (PERF.md round 3). This DiT is trained from scratch in-framework
# (the reference's LightningDiT is an external, un-vendored submodule —
# SURVEY.md section 2.7), so head count is a free architecture choice;
# pass num_heads=16 to make_dit_config to match LightningDiT exactly.
DIT_PRESETS = {
    "DiT-B/1": dict(dim=768, depth=12, num_heads=12, patch_size=1),
    "DiT-L/1": dict(dim=1024, depth=24, num_heads=16, patch_size=1),
    "DiT-XL/1": dict(dim=1152, depth=28, num_heads=18, patch_size=1),
    "DiT-XL/2": dict(dim=1152, depth=28, num_heads=18, patch_size=2),
}


def make_dit_config(preset: str = "DiT-XL/1", **kw) -> DiTConfig:
    base = dict(DIT_PRESETS[preset])
    base.update(kw)
    return DiTConfig(**base)


# -------------------------------------------------------------------- init


def init_dit_params(key: jax.Array, cfg: DiTConfig) -> dict:
    k = jax.random.split(key, 10)
    d = cfg.dim

    def lin(key, i, o, std=0.02, zero=False, bias=True):
        p = {"kernel": jnp.zeros((i, o), jnp.float32) if zero else trunc_normal(key, (i, o), std)}
        p["bias"] = jnp.zeros((o,), jnp.float32) if bias else None
        return p

    def block(bk):
        kk = jax.random.split(bk, 6)
        return {
            "attn": {
                "qkv": lin(kk[0], d, 3 * d),
                "proj": lin(kk[1], d, d),
                "q_norm": {"scale": jnp.ones((cfg.head_dim,), jnp.float32)},
                "k_norm": {"scale": jnp.ones((cfg.head_dim,), jnp.float32)},
            },
            "mlp": {
                "w1": lin(kk[2], d, cfg.ffn_hidden),
                "w2": lin(kk[3], d, cfg.ffn_hidden),
                "w3": lin(kk[4], cfg.ffn_hidden, d),
            },
            # adaLN-zero: 6 modulation vectors, zero-init so each block
            # starts as identity
            "ada": lin(kk[5], d, 6 * d, zero=True),
        }

    params = {
        "x_embed": lin(k[0], cfg.token_dim, d),
        "t_embed": {
            "fc1": lin(k[1], 256, d),
            "fc2": lin(k[2], d, d),
        },
        "y_embed": normal(k[3], (cfg.num_classes + 1, d), 0.02),
        "rope": {"periods": rope_periods_init(cfg.head_dim, cfg.rope_base, dtype=jnp.float32)},
        "blocks": jax.vmap(block)(jax.random.split(k[4], cfg.depth)),
        "final": {
            "ada": lin(k[5], d, 2 * d, zero=True),
            "proj": lin(k[6], d, cfg.token_dim, zero=True),
        },
    }
    return params


# ----------------------------------------------------------------- forward


def timestep_embedding(t: jax.Array, dim: int = 256, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding (DiT convention); t in [0, 1] is
    scaled by 1000 to match diffusion-step magnitudes."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = (t.astype(jnp.float32) * 1000.0)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _dit_block(x: jax.Array, cond: jax.Array, p: dict, cfg: DiTConfig,
               rope, compute_dtype) -> jax.Array:
    B, N, D = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    ada = linear(jax.nn.silu(cond), p["ada"], compute_dtype).astype(jnp.float32)
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(ada, 6, axis=-1)

    h = rms_norm(x, jnp.ones((D,), jnp.float32), cfg.norm_eps)
    h = _modulate(h, sh1, sc1)
    qkv = linear(h, p["attn"]["qkv"], compute_dtype)

    from vtp_tpu.ops.dispatch import kernel_dispatch

    use_fused = False
    if jax.default_backend() == "tpu" and not kernel_dispatch().disable_flash:
        from vtp_tpu.ops.flash_attention import (
            fused_attention_supported,
            fused_qkv_rope_attention,
        )

        use_fused = fused_attention_supported((B, N, 3 * D), qkv.dtype, nh,
                                              qk_norm=cfg.use_qk_norm)
    if use_fused:
        o = fused_qkv_rope_attention(
            qkv, rope[0] if rope else None, rope[1] if rope else None, nh,
            q_scale=p["attn"]["q_norm"]["scale"] if cfg.use_qk_norm else None,
            k_scale=p["attn"]["k_norm"]["scale"] if cfg.use_qk_norm else None,
        )
    else:
        qkv4 = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv4[0], qkv4[1], qkv4[2]
        if cfg.use_qk_norm:
            # eps 1e-5 matches the fused kernel's in-kernel qk-RMSNorm
            q = rms_norm(q, p["attn"]["q_norm"]["scale"], 1e-5)
            k = rms_norm(k, p["attn"]["k_norm"]["scale"], 1e-5)
        if rope is not None:
            from vtp_tpu.ops.rope import apply_rope_with_prefix

            q, k = apply_rope_with_prefix(q, k, rope[0], rope[1])
        if compute_dtype is not None:
            q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
        o = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(B, N, D)
    from jax.ad_checkpoint import checkpoint_name

    # named for remat="attn"/"dots_attn" (models/blocks.remat_wrap)
    o = checkpoint_name(o, "attn_out")
    o = linear(o, p["attn"]["proj"], compute_dtype)
    x = x + g1[:, None, :] * o.astype(jnp.float32)

    h = rms_norm(x, jnp.ones((D,), jnp.float32), cfg.norm_eps)
    h = _modulate(h, sh2, sc2)
    h1 = linear(h, p["mlp"]["w1"], compute_dtype)
    h2 = linear(h, p["mlp"]["w2"], compute_dtype)
    o = linear(jax.nn.silu(h1) * h2, p["mlp"]["w3"], compute_dtype)
    return x + g2[:, None, :] * o.astype(jnp.float32)


def dit_forward(
    params: dict,
    cfg: DiTConfig,
    x: jax.Array,          # (B, C, H, W) latents
    t: jax.Array,          # (B,) in [0, 1]
    y: jax.Array,          # (B,) int labels (cfg.null_label for uncond)
    *,
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    remat: Union[bool, str] = False,
    unroll: bool = False,
) -> jax.Array:
    """Predict velocity field v(x_t, t, y); returns (B, C, H, W)."""
    B, C, H, W = x.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    # patchify: (B, C, H, W) -> (B, gh*gw, C*ps*ps)
    tok = x.reshape(B, C, gh, ps, gw, ps).transpose(0, 2, 4, 1, 3, 5)
    tok = tok.reshape(B, gh * gw, C * ps * ps)
    h = linear(tok, params["x_embed"], compute_dtype).astype(jnp.float32)

    t_emb = timestep_embedding(t)
    t_emb = linear(
        jax.nn.silu(linear(t_emb, params["t_embed"]["fc1"], compute_dtype)),
        params["t_embed"]["fc2"], compute_dtype,
    )
    y_emb = params["y_embed"][y]
    cond = (t_emb.astype(jnp.float32) + y_emb).astype(jnp.float32)

    rope = rope_sincos(params["rope"]["periods"], gh, gw)

    def body(carry, layer_params):
        return _dit_block(carry, cond, layer_params, cfg, rope, compute_dtype), None

    from vtp_tpu.models.blocks import remat_wrap

    body = remat_wrap(body, remat)
    if unroll:
        # unrolled backward avoids the scan transpose's stacked-grad DUS
        # accumulation (see models/blocks.scan_blocks); ~15% faster train
        # steps on v5e at the cost of compile time
        # depth off the stacked ada weight; "q" when int8-quantized
        # (utils/quantization.quantize_matmul_params serving trees)
        ada_w = params["blocks"]["ada"]
        depth = (ada_w["kernel"] if "kernel" in ada_w else ada_w["q"]).shape[0]
        for i in range(depth):
            h, _ = body(h, jax.tree.map(lambda a: a[i], params["blocks"]))
    else:
        h, _ = jax.lax.scan(body, h, params["blocks"])

    ada = linear(jax.nn.silu(cond), params["final"]["ada"], compute_dtype).astype(jnp.float32)
    shift, scale = jnp.split(ada, 2, axis=-1)
    h = rms_norm(h, jnp.ones((cfg.dim,), jnp.float32), cfg.norm_eps)
    h = _modulate(h, shift, scale)
    out = linear(h, params["final"]["proj"], compute_dtype)
    # unpatchify
    out = out.reshape(B, gh, gw, C, ps, ps).transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(B, C, H, W).astype(jnp.float32)
