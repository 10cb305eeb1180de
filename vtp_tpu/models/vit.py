"""DINOv3 vision transformer trunk with optional feature bottleneck.

Behavioral reference:
``vtp/models/encoders/vision_transformer.py:58-410`` (trunk) and
``vtp/models/encoders/vision_transformer_bottleneck.py:11-104``
(bottleneck variant). One implementation covers both — the bottleneck
is an optional ``feature_bottleneck`` Linear applied to normalized
cls/patch tokens when ``use_bottleneck=True``.

TPU-first: patchify is a reshape+GEMM, RoPE tables are built once per
forward per crop shape, and the depth loop is a ``lax.scan`` over
stacked block params.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from vtp_tpu.models.blocks import BlockConfig, Rope, init_stacked_blocks, scan_blocks
from vtp_tpu.models.initializers import linear_init, normal, patch_embed_uniform, trunc_normal
from vtp_tpu.ops.norms import apply_norm, norm_eps
from vtp_tpu.ops.patchify import patchify
from vtp_tpu.ops.rope import pad_rope_prefix, rope_periods_init, rope_sincos

ROPE_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    in_chans: int = 3
    ffn_ratio: float = 4.0
    ffn_layer: str = "swiglu"
    norm_layer: str = "rmsnorm"
    layerscale_init: Optional[float] = None
    use_qk_norm: bool = False
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    n_storage_tokens: int = 0
    mask_k_bias: bool = False
    untie_cls_and_patch_norms: bool = False
    untie_global_and_local_cls_norm: bool = False
    feature_bottleneck: Optional[int] = None  # None or == embed_dim -> no bottleneck
    # RoPE
    rope_base: Optional[float] = 100.0
    rope_min_period: Optional[float] = None
    rope_max_period: Optional[float] = None
    rope_normalize_coords: str = "separate"
    rope_shift_coords: Optional[float] = None
    rope_jitter_coords: Optional[float] = None
    rope_rescale_coords: Optional[float] = None
    rope_dtype: str = "bf16"
    # head-major TP layout factor of the trunk's qkv parameters
    # (parallel.sharding.qkv_head_major; see BlockConfig.qkv_head_major).
    # Deployment property, not a model property: set it (dataclasses.
    # replace) when the params were permuted for a model-parallel mesh.
    qkv_head_major: int = 1

    @property
    def block(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            ffn_ratio=self.ffn_ratio,
            ffn_layer=self.ffn_layer,
            norm_kind=self.norm_layer,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            ffn_bias=self.ffn_bias,
            layerscale_init=self.layerscale_init,
            use_qk_norm=self.use_qk_norm,
            mask_k_bias=self.mask_k_bias,
            qkv_head_major=self.qkv_head_major,
        )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def has_bottleneck(self) -> bool:
        return self.feature_bottleneck is not None and self.feature_bottleneck != self.embed_dim


def init_vit_params(key: jax.Array, cfg: ViTConfig) -> dict:
    k = jax.random.split(key, 8)
    d = cfg.embed_dim
    pk = cfg.patch_size
    params = {
        "patch_embed": {
            "kernel": patch_embed_uniform(k[0], (cfg.in_chans * pk * pk, d), cfg.in_chans, pk),
            "bias": patch_embed_uniform(k[1], (d,), cfg.in_chans, pk),
        },
        "cls_token": normal(k[2], (1, 1, d), 0.02),
        "mask_token": jnp.zeros((1, d), jnp.float32),
        "rope": {"periods": rope_periods_init(
            cfg.head_dim, cfg.rope_base, cfg.rope_min_period, cfg.rope_max_period,
            dtype=ROPE_DTYPES[cfg.rope_dtype],
        )},
        "blocks": init_stacked_blocks(k[3], cfg.block, cfg.depth),
        "norm": _norm_init(cfg.norm_layer, d),
    }
    if cfg.n_storage_tokens > 0:
        params["storage_tokens"] = normal(k[4], (1, cfg.n_storage_tokens, d), 0.02)
    if cfg.untie_cls_and_patch_norms:
        params["cls_norm"] = _norm_init(cfg.norm_layer, d)
    if cfg.untie_global_and_local_cls_norm:
        params["local_cls_norm"] = _norm_init(cfg.norm_layer, d)
    if cfg.has_bottleneck:
        params["feature_bottleneck"] = {
            "kernel": trunc_normal(k[5], (d, cfg.feature_bottleneck), 0.02),
            "bias": None,
        }
    return params


def _norm_init(kind: str, dim: int) -> dict:
    p = {"scale": jnp.ones((dim,), jnp.float32)}
    if kind != "rmsnorm":
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    return p


def prepare_tokens(
    params: dict,
    cfg: ViTConfig,
    images: jax.Array,
    masks: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Patchify + [cls | storage | patches]
    (vision_transformer.py:189-219). images: (B, C, H, W) NCHW."""
    B, _, H, W = images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    x = patchify(
        images, params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        patch=cfg.patch_size, compute_dtype=compute_dtype,
    )  # (B, gh*gw, D)
    if masks is not None:
        x = jnp.where(masks[..., None], params["mask_token"][None].astype(x.dtype), x)
    cls_token = params["cls_token"].astype(x.dtype)
    pieces = [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim))]
    if cfg.n_storage_tokens > 0:
        pieces.append(jnp.broadcast_to(
            params["storage_tokens"].astype(x.dtype), (B, cfg.n_storage_tokens, cfg.embed_dim)
        ))
    pieces.append(x)
    return jnp.concatenate(pieces, axis=1), (gh, gw)


def token_pad_len(n: int, compute_dtype: Optional[jnp.dtype]) -> int:
    """Sequence length rounded up to the TPU sublane tile so the
    (B, N, D) <-> (B*N, D) reshapes around the packed GEMMs and the
    fused attention kernel are free bitcasts instead of relayout copies.

    Measured on v5e (VTP-L, batch 32): N=257 unaligned costs ~10.7 ms of
    pure reshape copies per encode step — 26% of the GEMM time — while
    the padded GEMM rows add only N_pad/N - 1 (2.7-5.8%) extra FLOPs.
    Padded rows are zero tokens; attention masks them as keys (n_valid)
    and their outputs are sliced off after the block stack, so results
    are unchanged. fp32 tiles are (8, 128); bf16 packs 2 rows per
    sublane, so the row multiple is 16."""
    from vtp_tpu.ops.dispatch import kernel_dispatch

    d = kernel_dispatch()
    if d.disable_token_pad:
        return n
    if jax.default_backend() != "tpu" and not d.force_token_pad:
        return n
    m = 16 if compute_dtype == jnp.bfloat16 else 8
    return ((n + m - 1) // m) * m


def _pad_tokens(x: jax.Array, rope: Rope, n_pad: int) -> Tuple[jax.Array, Rope]:
    n = x.shape[1]
    if n_pad == n:
        return x, rope
    x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    if rope is not None:
        sin, cos = rope
        sin = jnp.pad(sin, ((0, n_pad - n), (0, 0)))
        cos = jnp.pad(cos, ((0, n_pad - n), (0, 0)))
        rope = (sin, cos)
    return x, rope


def _rope_for(
    params: dict, cfg: ViTConfig, gh: int, gw: int,
    key: Optional[jax.Array], training: bool,
) -> Rope:
    sin, cos = rope_sincos(
        params["rope"]["periods"], gh, gw,
        normalize_coords=cfg.rope_normalize_coords,
        shift_coords=cfg.rope_shift_coords,
        jitter_coords=cfg.rope_jitter_coords,
        rescale_coords=cfg.rope_rescale_coords,
        key=key, training=training,
    )
    # pre-pad for the unrotated cls+storage prefix once per forward, so
    # per-layer rope application is one fused elementwise op
    return pad_rope_prefix(sin, cos, 1 + cfg.n_storage_tokens)


def _final_norms(
    params: dict, cfg: ViTConfig, x: jax.Array, *, crop_index: int, training: bool
) -> Tuple[jax.Array, jax.Array]:
    """Final norm with optional untied cls/patch norms
    (vision_transformer.py:236-248). Returns (cls_reg_normed, patch_normed)."""
    s = cfg.n_storage_tokens + 1
    eps = norm_eps(cfg.norm_layer)
    if cfg.untie_cls_and_patch_norms or cfg.untie_global_and_local_cls_norm:
        if cfg.untie_global_and_local_cls_norm and training and crop_index == 1:
            cls_reg = apply_norm(x[:, :s], params["local_cls_norm"], cfg.norm_layer, eps)
        elif cfg.untie_cls_and_patch_norms:
            cls_reg = apply_norm(x[:, :s], params["cls_norm"], cfg.norm_layer, eps)
        else:
            cls_reg = apply_norm(x[:, :s], params["norm"], cfg.norm_layer, eps)
        patch = apply_norm(x[:, s:], params["norm"], cfg.norm_layer, eps)
    else:
        xn = apply_norm(x, params["norm"], cfg.norm_layer, eps)
        cls_reg, patch = xn[:, :s], xn[:, s:]
    return cls_reg, patch


def _apply_bottleneck(params: dict, t: jax.Array, compute_dtype) -> jax.Array:
    kernel = params["feature_bottleneck"]["kernel"]
    if compute_dtype is not None:
        t = t.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return t @ kernel


def vit_forward_features(
    params: dict,
    cfg: ViTConfig,
    images: Union[jax.Array, Sequence[jax.Array]],
    masks: Union[None, jax.Array, Sequence[Optional[jax.Array]]] = None,
    *,
    use_bottleneck: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    training: bool = False,
    drop_ratio: float = 0.0,
    key: Optional[jax.Array] = None,
    drop_shards: int = 1,
    remat: Union[bool, str] = False,
    unroll: bool = False,
) -> Union[Dict[str, jax.Array], List[Dict[str, jax.Array]]]:
    """forward_features(_list): returns the reference's output dict(s)
    {x_norm_clstoken, x_storage_tokens, x_norm_patchtokens, x_prenorm, masks}
    (vision_transformer.py:221-264)."""
    single = not isinstance(images, (list, tuple))
    x_list = [images] if single else list(images)
    masks_list = [masks] if single else (list(masks) if masks is not None else [None] * len(x_list))

    rope_key = drop_key = None
    if key is not None:
        rope_key, drop_key = jax.random.split(key)

    xs, ropes, n_valids = [], [], []
    for i, (img, m) in enumerate(zip(x_list, masks_list)):
        t, (gh, gw) = prepare_tokens(params, cfg, img, m, compute_dtype)
        rk = jax.random.fold_in(rope_key, i) if rope_key is not None else None
        rope = _rope_for(params, cfg, gh, gw, rk, training)
        n_valids.append(t.shape[1])
        t, rope = _pad_tokens(t, rope, token_pad_len(t.shape[1], compute_dtype))
        xs.append(t)
        ropes.append(rope)

    xs, _ = scan_blocks(
        tuple(xs), params["blocks"], cfg.block, ropes,
        depth=cfg.depth, compute_dtype=compute_dtype,
        drop_ratio=drop_ratio, training=training, key=drop_key,
        drop_shards=drop_shards, remat=remat, n_valids=n_valids,
        unroll=unroll,
    )

    outputs = []
    for i, (x, m) in enumerate(zip(xs, masks_list)):
        x = x[:, :n_valids[i]]  # drop alignment-pad rows
        cls_reg, patch = _final_norms(params, cfg, x, crop_index=i, training=training)
        out = {
            "x_norm_clstoken": cls_reg[:, 0],
            "x_storage_tokens": cls_reg[:, 1:],
            "x_norm_patchtokens": patch,
            "x_prenorm": x,
            "masks": m,
        }
        if use_bottleneck and cfg.has_bottleneck:
            out["x_norm_clstoken"] = _apply_bottleneck(params, out["x_norm_clstoken"], compute_dtype)
            out["x_norm_patchtokens"] = _apply_bottleneck(params, out["x_norm_patchtokens"], compute_dtype)
        outputs.append(out)
    return outputs[0] if single else outputs


def vit_get_intermediate_layers(
    params: dict,
    cfg: ViTConfig,
    images: jax.Array,
    n: Union[int, Sequence[int]] = 1,
    *,
    reshape: bool = False,
    return_class_token: bool = False,
    return_extra_tokens: bool = False,
    norm: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple:
    """get_intermediate_layers, always bypassing the bottleneck
    (vision_transformer.py:281-318, bottleneck variant :81-97).

    Only contiguous trailing windows (int ``n``) run in the efficient
    two-segment scan; arbitrary index lists fall back to collecting from
    the last ``max_index+1`` blocks.
    """
    if isinstance(n, int):
        take = list(range(cfg.depth - n, cfg.depth))
    else:
        take = sorted(int(i) for i in n)
    collect = cfg.depth - min(take)

    x, (gh, gw) = prepare_tokens(params, cfg, images, None, compute_dtype)
    rope = _rope_for(params, cfg, gh, gw, None, False)
    n_valid = x.shape[1]
    x, rope = _pad_tokens(x, rope, token_pad_len(n_valid, compute_dtype))
    _, collected = scan_blocks(
        (x,), params["blocks"], cfg.block, [rope],
        depth=cfg.depth, compute_dtype=compute_dtype, collect_last=collect,
        n_valids=[n_valid],
    )
    base = cfg.depth - collect
    outputs = [collected[i - base][0][:, :n_valid] for i in take]

    s = cfg.n_storage_tokens + 1
    eps = norm_eps(cfg.norm_layer)
    if norm:
        normed = []
        for out in outputs:
            if cfg.untie_cls_and_patch_norms:
                cls_reg = apply_norm(out[:, :s], params["cls_norm"], cfg.norm_layer, eps)
                patch = apply_norm(out[:, s:], params["norm"], cfg.norm_layer, eps)
                normed.append(jnp.concatenate([cls_reg, patch], axis=1))
            else:
                normed.append(apply_norm(out, params["norm"], cfg.norm_layer, eps))
        outputs = normed

    class_tokens = [o[:, 0] for o in outputs]
    extra = [o[:, 1:s] for o in outputs]
    patches = [o[:, s:] for o in outputs]
    if reshape:
        B = images.shape[0]
        patches = [
            o.reshape(B, gh, gw, -1).transpose(0, 3, 1, 2) for o in patches
        ]
    if not return_class_token and not return_extra_tokens:
        return tuple(patches)
    if return_class_token and not return_extra_tokens:
        return tuple(zip(patches, class_tokens))
    if not return_class_token and return_extra_tokens:
        return tuple(zip(patches, extra))
    return tuple(zip(patches, class_tokens, extra))


# ---------------------------------------------------------------- factories
# Trunk size factories mirroring the reference's vit_* constructors
# (vision_transformer.py:328-410). They return ViTConfig values —
# params are pytrees here, so "constructing a model" means picking a
# config and calling init_vit_params.

def _vit_cfg(patch_size: int, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, **kw)


def vit_small(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:328-337."""
    return _vit_cfg(patch_size, embed_dim=384, depth=12, num_heads=6, ffn_ratio=4.0, **kw)


def vit_base(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:340-349."""
    return _vit_cfg(patch_size, embed_dim=768, depth=12, num_heads=12, ffn_ratio=4.0, **kw)


def vit_large(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:352-361."""
    return _vit_cfg(patch_size, embed_dim=1024, depth=24, num_heads=16, ffn_ratio=4.0, **kw)


def vit_so400m(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:364-373."""
    return _vit_cfg(patch_size, embed_dim=1152, depth=27, num_heads=18,
                    ffn_ratio=3.777777778, **kw)


def vit_huge2(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:376-385."""
    return _vit_cfg(patch_size, embed_dim=1280, depth=32, num_heads=20, ffn_ratio=4.0, **kw)


def vit_giant2(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:388-398 (1536 dim, 24 heads -> head_dim 64)."""
    return _vit_cfg(patch_size, embed_dim=1536, depth=40, num_heads=24, ffn_ratio=4.0, **kw)


def vit_7b(patch_size: int = 16, **kw) -> ViTConfig:
    """vision_transformer.py:401-410."""
    return _vit_cfg(patch_size, embed_dim=4096, depth=40, num_heads=32, ffn_ratio=3.0, **kw)


VIT_FACTORIES = {
    "vit_small": vit_small,
    "vit_base": vit_base,
    "vit_large": vit_large,
    "vit_so400m": vit_so400m,
    "vit_huge2": vit_huge2,
    "vit_giant2": vit_giant2,
    "vit_7b": vit_7b,
}
