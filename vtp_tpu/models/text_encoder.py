"""CLIP-style text transformer.

Behavioral reference: ``vtp/models/encoders/text_transformer.py:21-453``
(Transformer of ResidualAttentionBlocks + TextTransformer pooling) and
its consumption inside VTPModel.get_clip_text_feature
(modeling_vtp.py:278-310).

The block is a pre-LN residual transformer with torch
``nn.MultiheadAttention`` semantics (fused in_proj, additive causal
mask). Depth is scanned over stacked params like the vision towers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from vtp_tpu.models.blocks import remat_wrap
from vtp_tpu.models.initializers import normal
from vtp_tpu.ops.activations import ACT
from vtp_tpu.ops.attention import sdpa
from vtp_tpu.ops.ffn import linear
from vtp_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: Optional[int] = 768
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"  # first | last | argmax | none
    proj_type: str = "linear"  # linear | none (bare-matrix ckpts convert to linear)
    proj_bias: bool = False
    quick_gelu: bool = False
    output_tokens: bool = False  # text_transformer.py:449-450
    ln_eps: float = 1e-5  # torch nn.LayerNorm default

    @property
    def num_pos(self) -> int:
        return self.context_length + (1 if self.embed_cls else 0)

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def mlp_width(self) -> int:
        return int(self.width * self.mlp_ratio)


def init_text_params(key: jax.Array, cfg: TextConfig) -> dict:
    """OpenAI CLIP init scheme (text_transformer.py:300-321)."""
    k = jax.random.split(key, 10)
    w = cfg.width
    proj_std = (w**-0.5) * ((2 * cfg.layers) ** -0.5)
    attn_std = w**-0.5
    fc_std = (2 * w) ** -0.5

    def ln():
        return {"scale": jnp.ones((w,), jnp.float32), "bias": jnp.zeros((w,), jnp.float32)}

    def block(bk):
        kk = jax.random.split(bk, 4)
        p = {
            "ln_1": ln(),
            "attn": {
                "in_proj": {"kernel": normal(kk[0], (w, 3 * w), attn_std),
                            "bias": jnp.zeros((3 * w,), jnp.float32)},
                "out_proj": {"kernel": normal(kk[1], (w, w), proj_std),
                             "bias": jnp.zeros((w,), jnp.float32)},
            },
            "ln_2": ln(),
            "mlp": {
                "c_fc": {"kernel": normal(kk[2], (w, cfg.mlp_width), fc_std),
                         "bias": jnp.zeros((cfg.mlp_width,), jnp.float32)},
                "c_proj": {"kernel": normal(kk[3], (cfg.mlp_width, w), proj_std),
                           "bias": jnp.zeros((w,), jnp.float32)},
            },
        }
        if cfg.ls_init_value is not None:
            p["ls_1"] = {"gamma": jnp.full((w,), cfg.ls_init_value, jnp.float32)}
            p["ls_2"] = {"gamma": jnp.full((w,), cfg.ls_init_value, jnp.float32)}
        return p

    params = {
        "token_embedding": normal(k[0], (cfg.vocab_size, w), 0.02),
        "positional_embedding": normal(k[1], (cfg.num_pos, w), 0.01),
        "blocks": jax.vmap(block)(jax.random.split(k[2], cfg.layers)),
        "ln_final": ln(),
    }
    if cfg.embed_cls:
        params["cls_emb"] = normal(k[3], (w,), 0.01)
    if cfg.proj_type != "none" and cfg.output_dim:
        params["text_projection"] = {
            "kernel": normal(k[4], (w, cfg.output_dim), w**-0.5),
            "bias": jnp.zeros((cfg.output_dim,), jnp.float32) if cfg.proj_bias else None,
        }
    return params


def _text_block(x: jax.Array, p: dict, cfg: TextConfig,
                attn_mask: Optional[jax.Array],
                compute_dtype: Optional[jnp.dtype],
                is_causal: bool = False) -> jax.Array:
    """``is_causal`` routes the plain-causal case (no embed_cls pad
    mask) through the fused Pallas kernel on TPU — the zero-shot
    classifier build runs 12 of these over 80k texts
    (test_zero_shot_hf.py:342-394)."""

    from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from vtp_tpu.parallel.sharding import constrain_residual, maybe_constrain

    B, L, W = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    act = ACT["quick_gelu" if cfg.quick_gelu else "gelu"]

    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"], cfg.ln_eps)
    qkv = linear(h, p["attn"]["in_proj"], compute_dtype)
    # Megatron layout pins (see models/blocks.attention_apply): batch
    # over data, column-parallel in_proj features over model
    qkv = maybe_constrain(qkv, DATA_AXIS, None, MODEL_AXIS)

    from vtp_tpu.ops.flash_attention import pallas_enabled

    o = None
    if is_causal and attn_mask is None and pallas_enabled():
        from vtp_tpu.ops.flash_attention import (
            fused_attention_supported,
            fused_qkv_rope_attention,
        )

        if fused_attention_supported((B, L, 3 * W), qkv.dtype, nh):
            o = fused_qkv_rope_attention(qkv, None, None, nh, is_causal=True)
    if o is None:
        qh = qkv.reshape(B, L, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = sdpa(qh[0], qh[1], qh[2], bias=attn_mask, is_causal=is_causal and attn_mask is None)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, W)
    o = maybe_constrain(o, DATA_AXIS, None, MODEL_AXIS)
    o = linear(o, p["attn"]["out_proj"], compute_dtype)
    if "ls_1" in p:
        o = o * p["ls_1"]["gamma"]
    x = constrain_residual(x + o, token_axis=1)

    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"], cfg.ln_eps)
    h = act(linear(h, p["mlp"]["c_fc"], compute_dtype))
    h = maybe_constrain(h, DATA_AXIS, None, MODEL_AXIS)
    h = linear(h, p["mlp"]["c_proj"], compute_dtype)
    if "ls_2" in p:
        h = h * p["ls_2"]["gamma"]
    return constrain_residual(x + h, token_axis=1)


def causal_mask(n: int) -> jax.Array:
    """Additive float causal mask (text_transformer.py:334-338)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)


def build_cls_mask(text: jax.Array, pad_id: int) -> jax.Array:
    """Pad-aware additive mask for the appended cls token
    (text_transformer.py:340-347).

    Matches the reference construction exactly: the (B, 1, L) pad mask
    is F.pad'ed with one always-True column on the key axis' LEFT and L
    all-True rows on top, so only the final (cls) query row masks
    anything — key 0 stays visible and key j>0 carries token j-1's pad
    status. Returns ``(B, 1, L+1, L+1)`` fp32, broadcastable over heads
    (the reference repeat_interleaves over heads instead; equivalent).
    """
    B, L = text.shape
    valid = text != pad_id  # (B, L)
    keys = jnp.pad(valid, ((0, 0), (1, 0)), constant_values=True)  # (B, L+1)
    cls_row = jnp.where(keys, 0.0, -jnp.inf).astype(jnp.float32)  # (B, L+1)
    mask = jnp.zeros((B, L + 1, L + 1), jnp.float32).at[:, L, :].set(cls_row)
    return mask[:, None]


def _text_embeds(
    params: dict, cfg: TextConfig, text: jax.Array
) -> Tuple[jax.Array, Optional[jax.Array], bool]:
    """Token embeddings (+ optional appended cls token) and the
    attention mask (text_transformer.py:349-361). Returns
    ``(x, mask, is_causal)`` — the plain-causal case carries no
    materialized mask so the block can use in-kernel causal masking."""
    B, L = text.shape
    x = params["token_embedding"][text]
    if cfg.embed_cls:
        seq = L + 1
        cls_tok = jnp.broadcast_to(params["cls_emb"][None, None, :], (B, 1, cfg.width))
        x = jnp.concatenate([x, cls_tok.astype(x.dtype)], axis=1)
        mask = None
        if not cfg.no_causal_mask:
            cls_mask = build_cls_mask(text, cfg.pad_id)
            mask = (causal_mask(cfg.num_pos)[None, None, :seq, :seq]
                    + cls_mask[:, :, :seq, :seq])
        x = x + params["positional_embedding"][:seq]
        return x, mask, False
    x = x + params["positional_embedding"][:L]
    return x, None, not cfg.no_causal_mask


def text_global_pool(x: jax.Array, text: Optional[jax.Array], pool_type: str) -> jax.Array:
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "argmax":
        assert text is not None
        return x[jnp.arange(x.shape[0]), jnp.argmax(text, axis=-1)]
    return x


def feature_take_indices(num_layers: int, indices) -> Tuple[list, int]:
    """Resolve intermediate-layer selections (reference
    models/utils/text_utils.py:113-151): int n -> last n layers;
    negative indices wrap."""
    if indices is None:
        indices = num_layers
    if isinstance(indices, int):
        take = list(range(num_layers - indices, num_layers))
    else:
        take = [i if i >= 0 else num_layers + i for i in indices]
    return take, max(take)


def text_forward_intermediates(
    params: dict,
    cfg: TextConfig,
    text: jax.Array,
    indices=None,
    *,
    normalize_intermediates: bool = False,
    intermediates_only: bool = False,
    output_extra_tokens: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
) -> dict:
    """Text tower with intermediate activations
    (text_transformer.py:363-413). Returns {text_intermediates,
    text_features?, text_intermediates_suffix?}."""
    take, _ = feature_take_indices(cfg.layers, indices)
    x, mask, is_causal = _text_embeds(params, cfg, text)

    def body(carry, p):
        out = _text_block(carry, p, cfg, mask, compute_dtype, is_causal)
        return out, out

    x, ys = jax.lax.scan(body, x, params["blocks"])
    inter = [ys[i] for i in take]
    if normalize_intermediates:
        inter = [
            layer_norm(t, params["ln_final"]["scale"], params["ln_final"]["bias"], cfg.ln_eps)
            for t in inter
        ]
    out = {}
    if cfg.embed_cls:
        # split the appended cls slot off each intermediate
        # (text_transformer.py:387-392)
        if output_extra_tokens:
            out["text_intermediates_suffix"] = [t[:, -1:] for t in inter]
        inter = [t[:, :-1] for t in inter]
    out["text_intermediates"] = inter
    if intermediates_only:
        return out
    out["text_features"] = _pool_project(params, cfg, x, text, compute_dtype)
    return out


def prune_intermediate_layers(
    params: dict,
    cfg: TextConfig,
    indices=1,
    *,
    prune_norm: bool = False,
    prune_head: bool = True,
) -> Tuple[dict, TextConfig, list]:
    """Drop layers (and optionally ln_final / projection) not needed for
    the requested intermediates (text_transformer.py:415-427).

    Params are stacked along the depth axis, so pruning is a slice of
    every block leaf. Returns ``(pruned_params, pruned_cfg, take_indices)``
    — configs are frozen dataclasses, so a new one is returned instead of
    mutating in place.
    """
    take, max_index = feature_take_indices(cfg.layers, indices)
    keep = max_index + 1
    params = dict(params)
    params["blocks"] = jax.tree.map(lambda a: a[:keep], params["blocks"])
    if prune_norm:
        w = cfg.width
        params["ln_final"] = {
            "scale": jnp.ones((w,), jnp.float32),
            "bias": jnp.zeros((w,), jnp.float32),
        }
    if prune_head:
        params.pop("text_projection", None)
    return params, dataclasses.replace(cfg, layers=keep), take


def _pool_project(
    params: dict,
    cfg: TextConfig,
    x: jax.Array,
    text: jax.Array,
    compute_dtype: Optional[jnp.dtype],
    *,
    want_tokens: bool = False,
):
    """Final-norm + pool + projection (text_transformer.py:429-452).
    With embed_cls the pool is the appended last token and ln_final is
    applied AFTER pooling (only to the pooled vector); tokens stay
    unnormed."""
    ln = params["ln_final"]
    if cfg.embed_cls:
        pooled = layer_norm(x[:, -1], ln["scale"], ln["bias"], cfg.ln_eps)
        tokens = x[:, :-1]
    else:
        x = layer_norm(x, ln["scale"], ln["bias"], cfg.ln_eps)
        pooled = text_global_pool(x, text, cfg.pool_type)
        tokens = x
    proj = params.get("text_projection")
    if proj is not None:
        pooled = linear(pooled, proj, compute_dtype)
    if want_tokens:
        return pooled, tokens
    return pooled


def text_encode(
    params: dict,
    cfg: TextConfig,
    text: jax.Array,
    *,
    normalize: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: Union[bool, str] = False,
    unroll: bool = False,
) -> jax.Array:
    """Token IDs (B, L) -> pooled, projected text features
    (modeling_vtp.py:295-310, text_transformer.py:429-452). When
    ``cfg.output_tokens`` is set, returns ``(pooled, tokens)`` where
    tokens are the (unprojected) sequence features.

    Embedding lookups are not autocast ops in torch — the residual
    stream stays fp32; each linear casts to compute_dtype internally.

    ``unroll=True`` replaces the ``lax.scan`` depth loop with a Python
    loop, same trade as ``scan_blocks(unroll=True)``: the scan transpose
    saves the fp32 residual stream into stacked (depth, B, L, width)
    buffers and accumulates weight grads via dynamic-update-slice —
    ~19.6 ms/step of a VTP-B SSL train step vs a ~6.4 ms matmul floor
    in the round-3 trace — while the unrolled backward schedules freely.
    ``remat`` applies remat_wrap per layer (compile-time/memory knob)."""
    x, mask, is_causal = _text_embeds(params, cfg, text)

    def body(carry, p):
        return _text_block(carry, p, cfg, mask, compute_dtype, is_causal), None

    body = remat_wrap(body, remat)
    if unroll is True or unroll == cfg.layers:
        for i in range(cfg.layers):
            x, _ = body(x, jax.tree.map(lambda a: a[i], params["blocks"]))
    else:
        x, _ = jax.lax.scan(body, x, params["blocks"])
    pooled, tokens = _pool_project(params, cfg, x, text, compute_dtype, want_tokens=True)
    if normalize:
        # torch F.normalize clamps the norm at eps=1e-12
        n = jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
        pooled = pooled / n
    if cfg.output_tokens:
        return pooled, tokens
    return pooled
