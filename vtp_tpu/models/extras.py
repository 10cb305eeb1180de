"""Auxiliary layers in the reference inventory that the shipped VTP
checkpoints do not exercise, provided for capability parity.

Behavioral references:
  * CausalSelfAttention / CausalSelfAttentionBlock —
    vtp/models/layers/attention.py:129-174, block.py:311-367
  * Attention (CLIP-style, optional scaled-cosine + per-head scale) —
    attention.py:177-273
  * CustomResidualAttentionBlock — block.py:430-476
  * AttentionalPooler — attention.py:276-301
  * PatchDropout — misc.py:29-71
  * MultimodalTransformer (cross-attention text decoder) —
    text_transformer.py:455-561
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vtp_tpu.models.initializers import linear_init, normal
from vtp_tpu.ops.activations import gelu_exact
from vtp_tpu.ops.attention import sdpa
from vtp_tpu.ops.ffn import linear, mlp
from vtp_tpu.ops.norms import layer_norm


# ----------------------------------------------------- causal AR block


def init_causal_block_params(key: jax.Array, dim: int, ffn_ratio: float = 4.0,
                             ls_init_value: Optional[float] = None) -> dict:
    """AR block init scheme (block.py:344-358): attn std d^-1/2, fc std
    (2d)^-1/2."""
    k = jax.random.split(key, 4)
    hidden = int(dim * ffn_ratio)
    p = {
        "attention_norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "attention": {
            "qkv": {"kernel": normal(k[0], (dim, 3 * dim), dim**-0.5),
                    "bias": jnp.zeros((3 * dim,))},
            "proj": {"kernel": normal(k[1], (dim, dim), dim**-0.5),
                     "bias": jnp.zeros((dim,))},
        },
        "ffn_norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "feed_forward": {
            "fc1": {"kernel": normal(k[2], (dim, hidden), (2 * dim) ** -0.5),
                    "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": normal(k[3], (hidden, dim), dim**-0.5),
                    "bias": jnp.zeros((dim,))},
        },
    }
    if ls_init_value is not None:
        p["ls1"] = {"gamma": jnp.full((dim,), ls_init_value)}
        p["ls2"] = {"gamma": jnp.full((dim,), ls_init_value)}
    return p


def causal_block_apply(x: jax.Array, p: dict, num_heads: int,
                       is_causal: bool = True,
                       compute_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    B, N, C = x.shape
    hd = C // num_heads
    h = layer_norm(x, p["attention_norm"]["scale"], p["attention_norm"]["bias"])
    qkv = linear(h, p["attention"]["qkv"], compute_dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    o = sdpa(qkv[0], qkv[1], qkv[2], is_causal=is_causal)
    o = linear(o.transpose(0, 2, 1, 3).reshape(B, N, C), p["attention"]["proj"], compute_dtype)
    if "ls1" in p:
        o = o * p["ls1"]["gamma"]
    x = x + o
    h = layer_norm(x, p["ffn_norm"]["scale"], p["ffn_norm"]["bias"])
    o = mlp(h, p["feed_forward"], gelu_exact, compute_dtype)
    if "ls2" in p:
        o = o * p["ls2"]["gamma"]
    return x + o


# ------------------------------------- CLIP-style (scaled-cosine) attn


def init_custom_attention_params(key: jax.Array, dim: int, num_heads: int,
                                 scaled_cosine: bool = False,
                                 scale_heads: bool = False) -> dict:
    k = jax.random.split(key, 2)
    scale = (dim // num_heads) ** -0.5
    p = {
        "in_proj": {"kernel": scale * jax.random.normal(k[0], (dim, 3 * dim)),
                    "bias": jnp.zeros((3 * dim,))},
        "out_proj": linear_init(k[1], dim, dim),
    }
    if scaled_cosine:
        p["logit_scale"] = jnp.full((num_heads, 1, 1), math.log(10.0))
    if scale_heads:
        p["head_scale"] = jnp.ones((num_heads, 1, 1))
    return p


def custom_attention_apply(
    x: jax.Array, p: dict, num_heads: int,
    attn_mask: Optional[jax.Array] = None,
    logit_scale_max: float = math.log(1.0 / 0.01),
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """attention.py:221-273 incl. the scaled-cosine branch."""
    B, L, C = x.shape
    hd = C // num_heads
    qkv = linear(x, p["in_proj"], compute_dtype)
    q, k, v = (t.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1))
    if "logit_scale" in p:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qn, kn, preferred_element_type=jnp.float32)
        scores = scores * jnp.exp(jnp.minimum(p["logit_scale"], logit_scale_max))[None]
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        o = sdpa(q, k, v, bias=attn_mask)
    if "head_scale" in p:
        o = o * p["head_scale"][None]
    o = o.transpose(0, 2, 1, 3).reshape(B, L, C)
    return linear(o, p["out_proj"], compute_dtype)


# ------------------------------------------------- attentional pooler


def init_attentional_pooler_params(key: jax.Array, d_model: int,
                                   context_dim: int, n_queries: int = 256) -> dict:
    k = jax.random.split(key, 4)
    return {
        "query": jax.random.normal(k[0], (n_queries, d_model)),
        "ln_q": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
        "ln_k": {"scale": jnp.ones((context_dim,)), "bias": jnp.zeros((context_dim,))},
        "q_proj": linear_init(k[1], d_model, d_model),
        "k_proj": linear_init(k[2], context_dim, d_model),
        "v_proj": linear_init(k[3], context_dim, d_model),
        "out_proj": linear_init(jax.random.fold_in(key, 9), d_model, d_model),
    }


def attentional_pooler_apply(x: jax.Array, p: dict, n_head: int) -> jax.Array:
    """Learned-query MHA pooling (attention.py:276-301). x: (B, N, Ckv)."""
    B = x.shape[0]
    d = p["query"].shape[-1]
    hd = d // n_head
    xk = layer_norm(x, p["ln_k"]["scale"], p["ln_k"]["bias"])
    q = layer_norm(p["query"], p["ln_q"]["scale"], p["ln_q"]["bias"])
    q = linear(jnp.broadcast_to(q[None], (B, *q.shape)), p["q_proj"], None)
    k = linear(xk, p["k_proj"], None)
    v = linear(xk, p["v_proj"], None)
    to_heads = lambda t: t.reshape(B, t.shape[1], n_head, hd).transpose(0, 2, 1, 3)
    o = sdpa(to_heads(q), to_heads(k), to_heads(v))
    o = o.transpose(0, 2, 1, 3).reshape(B, -1, d)
    return linear(o, p["out_proj"], None)


# ----------------------------------------------------- patch dropout


def patch_dropout(
    key: jax.Array, x: jax.Array, prob: float,
    exclude_first_token: bool = True, training: bool = True,
) -> jax.Array:
    """Keep a random subset of tokens (misc.py:29-71); static keep count."""
    if not training or prob == 0.0:
        return x
    cls = None
    if exclude_first_token:
        cls, x = x[:, :1], x[:, 1:]
    B, N = x.shape[:2]
    keep = max(1, int(N * (1.0 - prob)))
    scores = jax.random.normal(key, (B, N))
    _, idx = jax.lax.top_k(scores, keep)
    x = jnp.take_along_axis(x, idx[..., None], axis=1)
    if cls is not None:
        x = jnp.concatenate([cls, x], axis=1)
    return x


# ----------------------------------------- multimodal (cross-attn) text


def multimodal_cross_block(
    text: jax.Array, image: jax.Array, p: dict, num_heads: int,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """One cross-attention ResidualAttentionBlock
    (block.py:370-427 with is_cross_attention=True)."""
    B, L, W = text.shape
    hd = W // num_heads
    q_in = layer_norm(text, p["ln_1"]["scale"], p["ln_1"]["bias"])
    kv_in = layer_norm(image, p["ln_1_kv"]["scale"], p["ln_1_kv"]["bias"])
    wq, wk, wv = jnp.split(p["attn"]["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["attn"]["in_proj"]["bias"], 3)
    q = (q_in @ wq + bq).reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
    k = (kv_in @ wk + bk).reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    v = (kv_in @ wv + bv).reshape(B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    o = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(B, L, W)
    o = linear(o, p["attn"]["out_proj"], compute_dtype)
    if "ls_1" in p:
        o = o * p["ls_1"]["gamma"]
    text = text + o
    h = layer_norm(text, p["ln_2"]["scale"], p["ln_2"]["bias"])
    h = linear(gelu_exact(linear(h, p["mlp"]["c_fc"], compute_dtype)),
               p["mlp"]["c_proj"], compute_dtype)
    if "ls_2" in p:
        h = h * p["ls_2"]["gamma"]
    return text + h


def _resblock_init(key: jax.Array, width: int, mlp_width: int, layers: int,
                   cross: bool = False) -> dict:
    """OpenAI-scheme init for one ResidualAttentionBlock
    (text_transformer.py:300-321 / :501-517)."""
    kk = jax.random.split(key, 4)
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    ln = lambda w=width: {"scale": jnp.ones((w,), jnp.float32),
                          "bias": jnp.zeros((w,), jnp.float32)}
    p = {
        "ln_1": ln(),
        "attn": {
            "in_proj": {"kernel": normal(kk[0], (width, 3 * width), attn_std),
                        "bias": jnp.zeros((3 * width,), jnp.float32)},
            "out_proj": {"kernel": normal(kk[1], (width, width), proj_std),
                         "bias": jnp.zeros((width,), jnp.float32)},
        },
        "ln_2": ln(),
        "mlp": {
            "c_fc": {"kernel": normal(kk[2], (width, mlp_width), fc_std),
                     "bias": jnp.zeros((mlp_width,), jnp.float32)},
            "c_proj": {"kernel": normal(kk[3], (mlp_width, width), proj_std),
                       "bias": jnp.zeros((width,), jnp.float32)},
        },
    }
    if cross:
        p["ln_1_kv"] = ln()
    return p


def init_multimodal_transformer_params(
    key: jax.Array,
    width: int,
    layers: int,
    *,
    mlp_ratio: float = 4.0,
    output_dim: int = 512,
) -> dict:
    """Full MultimodalTransformer (text_transformer.py:455-517):
    per layer one self-attention resblock + one cross-attention
    resblock, final LayerNorm, bare projection matrix. Params are
    stacked along depth for lax.scan."""
    mlp_width = int(width * mlp_ratio)
    k = jax.random.split(key, 4)
    res = jax.vmap(lambda kk: _resblock_init(kk, width, mlp_width, layers))(
        jax.random.split(k[0], layers)
    )
    cross = jax.vmap(lambda kk: _resblock_init(kk, width, mlp_width, layers, cross=True))(
        jax.random.split(k[1], layers)
    )
    return {
        "resblocks": res,
        "cross_attn": cross,
        "ln_final": {"scale": jnp.ones((width,), jnp.float32),
                     "bias": jnp.zeros((width,), jnp.float32)},
        "text_projection": {"kernel": normal(k[2], (width, output_dim), width**-0.5),
                            "bias": None},
    }


def multimodal_transformer_forward(
    params: dict,
    image_embs: jax.Array,   # (B, N_img, W)
    text_embs: jax.Array,    # (B, L, W)
    num_heads: int,
    context_length: int = 77,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """MultimodalTransformer.forward (text_transformer.py:534-557):
    per layer, causal self-attention over text then cross-attention into
    the image embeddings; ln_final + projection applied to ALL tokens
    (returns the full sequence, not a pooled vector)."""
    from vtp_tpu.models.text_encoder import TextConfig, _text_block, causal_mask

    L = text_embs.shape[1]
    W = text_embs.shape[-1]
    mask = causal_mask(context_length)[:L, :L]
    tcfg = TextConfig(width=W, heads=num_heads)

    def body(carry, p):
        t = _text_block(carry, p["res"], tcfg, mask, compute_dtype)
        t = multimodal_cross_block(t, image_embs, p["cross"], num_heads, compute_dtype)
        return t, None

    stacked = {"res": params["resblocks"], "cross": params["cross_attn"]}
    x, _ = jax.lax.scan(body, text_embs, stacked)
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"])
    return linear(x, params["text_projection"], compute_dtype)


# ---------------------------- CustomResidualAttentionBlock/-Transformer


def init_custom_resblock_params(
    key: jax.Array,
    dim: int,
    num_heads: int,
    *,
    mlp_ratio: float = 4.0,
    ls_init_value: Optional[float] = None,
    scale_cosine_attn: bool = False,
    scale_heads: bool = False,
    scale_attn: bool = False,
    scale_fc: bool = False,
) -> dict:
    """CustomResidualAttentionBlock (block.py:430-476): scaled-cosine
    Attention core with optional post-attention norm (scale_attn) and
    mid-MLP norm (scale_fc)."""
    k = jax.random.split(key, 3)
    mlp_width = int(dim * mlp_ratio)
    ln = lambda w: {"scale": jnp.ones((w,), jnp.float32),
                    "bias": jnp.zeros((w,), jnp.float32)}
    p = {
        "ln_1": ln(dim),
        "attn": init_custom_attention_params(
            k[0], dim, num_heads,
            scaled_cosine=scale_cosine_attn, scale_heads=scale_heads,
        ),
        "ln_2": ln(dim),
        "mlp": {
            "c_fc": linear_init(k[1], dim, mlp_width),
            "c_proj": linear_init(k[2], mlp_width, dim),
        },
    }
    if scale_attn:
        p["ln_attn"] = ln(dim)
    if scale_fc:
        p["mlp"]["ln"] = ln(mlp_width)
    if ls_init_value is not None:
        p["ls_1"] = {"gamma": jnp.full((dim,), ls_init_value, jnp.float32)}
        p["ls_2"] = {"gamma": jnp.full((dim,), ls_init_value, jnp.float32)}
    return p


def custom_resblock_apply(
    x: jax.Array, p: dict, num_heads: int,
    attn_mask: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """CustomResidualAttentionBlock.forward (block.py:473-476)."""
    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"])
    o = custom_attention_apply(h, p["attn"], num_heads, attn_mask,
                               compute_dtype=compute_dtype)
    if "ln_attn" in p:
        o = layer_norm(o, p["ln_attn"]["scale"], p["ln_attn"]["bias"])
    if "ls_1" in p:
        o = o * p["ls_1"]["gamma"]
    x = x + o
    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"])
    h = gelu_exact(linear(h, p["mlp"]["c_fc"], compute_dtype))
    if "ln" in p["mlp"]:
        h = layer_norm(h, p["mlp"]["ln"]["scale"], p["mlp"]["ln"]["bias"])
    h = linear(h, p["mlp"]["c_proj"], compute_dtype)
    if "ls_2" in p:
        h = h * p["ls_2"]["gamma"]
    return x + h


def init_custom_transformer_params(
    key: jax.Array, width: int, layers: int, num_heads: int, **block_kwargs
) -> dict:
    """CustomTransformer (text_transformer.py:111-153): a stack of
    CustomResidualAttentionBlocks, depth-stacked for lax.scan."""
    blocks = jax.vmap(
        lambda kk: init_custom_resblock_params(kk, width, num_heads, **block_kwargs)
    )(jax.random.split(key, layers))
    return {"resblocks": blocks}


def custom_transformer_forward(
    params: dict, x: jax.Array, num_heads: int,
    attn_mask: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """CustomTransformer.forward (text_transformer.py:198-210)."""
    def body(carry, p):
        return custom_resblock_apply(carry, p, num_heads, attn_mask, compute_dtype), None

    x, _ = jax.lax.scan(body, x, params["resblocks"])
    return x
