"""DINOv3-style transformer blocks, stacked for ``lax.scan``.

Behavioral reference: ``vtp/models/layers/block.py:137-308``
(SelfAttentionBlock incl. multi-crop list forward and stochastic-depth
batch-subset sampling) and ``vtp/models/layers/attention.py:41-126``
(SelfAttention with RoPE prefix handling).

TPU-first design choices:
  * Per-layer parameters are stacked along a leading ``depth`` axis and
    consumed by ``lax.scan`` — one block is compiled once regardless of
    depth, and XLA pipelines the layer loop.
  * Multi-crop lists are packed into a single ``(sum B_i*N_i, D)``
    matrix for every GEMM/norm (the reference's cat_keep_shapes trick,
    models/utils/utils.py:14-25) so crops of different resolution share
    one MXU-sized matmul; attention runs per crop (static shapes).
  * Stochastic depth keeps a *statically shaped* random batch subset
    (keep counts are Python ints), replacing the reference's
    DDP-broadcast allocation dance (block.py:20-118) with a
    deterministic equal-per-shard allocation from a shared PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vtp_tpu.models.initializers import linear_init, trunc_normal
from vtp_tpu.ops.activations import ACT
from vtp_tpu.ops.attention import sdpa
from vtp_tpu.ops.ffn import ffn_align_to, linear, mlp, swiglu, swiglu_hidden_dim
from vtp_tpu.ops.norms import apply_norm, norm_eps
from vtp_tpu.ops.rope import apply_rope_with_prefix
from vtp_tpu.ops.norms import rms_norm
from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vtp_tpu.parallel.sharding import constrain_residual, maybe_constrain

Rope = Optional[Tuple[jax.Array, jax.Array]]


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    ffn_ratio: float = 4.0
    ffn_layer: str = "swiglu"  # mlp | swiglu | swiglu32 | swiglu64 | swiglu128
    norm_kind: str = "rmsnorm"  # layernorm | layernormbf16 | rmsnorm
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    layerscale_init: Optional[float] = None
    use_qk_norm: bool = False
    mask_k_bias: bool = False  # LinearKMaskedBias (attention.py:26-38)
    act: str = "gelu"
    # head-major TP layout factor of the packed qkv parameters: 1 =
    # canonical [Q|K|V] columns; m > 1 = the columns are permuted into
    # m rank-major [Q_r|K_r|V_r] groups (parallel.sharding.qkv_head_major)
    # so a model-axis GSPMD shard of the qkv GEMM output is itself a
    # canonical packed qkv for num_heads/m heads — the fused Pallas
    # attention kernels (fwd + both bwd arms) then engage per-shard
    # under a model mesh of exactly that size. Math is identical to
    # canonical for ANY mesh (the XLA split regroups to canonical head
    # order); only the kernel-engagement layout differs.
    qkv_head_major: int = 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def eps(self) -> float:
        return norm_eps(self.norm_kind)

    @property
    def ffn_hidden(self) -> int:
        if self.ffn_layer == "mlp":
            return int(self.dim * self.ffn_ratio)
        return swiglu_hidden_dim(self.dim, self.ffn_ratio, ffn_align_to(self.ffn_layer))


# ----------------------------------------------------------------- init


def _norm_init(cfg: BlockConfig) -> dict:
    p = {"scale": jnp.ones((cfg.dim,), jnp.float32)}
    if cfg.norm_kind != "rmsnorm":
        p["bias"] = jnp.zeros((cfg.dim,), jnp.float32)
    return p


def init_block_params(key: jax.Array, cfg: BlockConfig) -> dict:
    k = jax.random.split(key, 8)
    d = cfg.dim
    p = {
        "norm1": _norm_init(cfg),
        "norm2": _norm_init(cfg),
        "attn": {
            "qkv": linear_init(k[0], d, 3 * d, bias=cfg.qkv_bias),
            "proj": linear_init(k[1], d, d, bias=cfg.proj_bias),
        },
    }
    if cfg.use_qk_norm:
        p["attn"]["q_norm"] = {"scale": jnp.ones((cfg.head_dim,), jnp.float32)}
        p["attn"]["k_norm"] = {"scale": jnp.ones((cfg.head_dim,), jnp.float32)}
    if cfg.ffn_layer == "mlp":
        p["mlp"] = {
            "fc1": linear_init(k[2], d, cfg.ffn_hidden, bias=cfg.ffn_bias),
            "fc2": linear_init(k[3], cfg.ffn_hidden, d, bias=cfg.ffn_bias),
        }
    else:
        p["mlp"] = {
            "w1": linear_init(k[2], d, cfg.ffn_hidden, bias=cfg.ffn_bias),
            "w2": linear_init(k[4], d, cfg.ffn_hidden, bias=cfg.ffn_bias),
            "w3": linear_init(k[5], cfg.ffn_hidden, d, bias=cfg.ffn_bias),
        }
    if cfg.layerscale_init is not None:
        p["ls1"] = {"gamma": jnp.full((d,), cfg.layerscale_init, jnp.float32)}
        p["ls2"] = {"gamma": jnp.full((d,), cfg.layerscale_init, jnp.float32)}
    return p


def init_stacked_blocks(key: jax.Array, cfg: BlockConfig, depth: int) -> dict:
    keys = jax.random.split(key, depth)
    return jax.vmap(lambda kk: init_block_params(kk, cfg))(keys)


# ------------------------------------------------------------- packing


def pack(xs: Sequence[jax.Array]) -> Tuple[jax.Array, List[Tuple[int, int]]]:
    """List of ``(B_i, N_i, D)`` -> ``(sum B_i*N_i, D)`` + shapes."""
    shapes = [(int(x.shape[0]), int(x.shape[1])) for x in xs]
    flat = [x.reshape(-1, x.shape[-1]) for x in xs]
    if len(flat) == 1:
        return flat[0], shapes
    return jnp.concatenate(flat, axis=0), shapes


def unpack(flat: jax.Array, shapes: List[Tuple[int, int]]) -> List[jax.Array]:
    out, off = [], 0
    d = flat.shape[-1]
    for b, n in shapes:
        out.append(jax.lax.slice_in_dim(flat, off, off + b * n, axis=0).reshape(b, n, d))
        off += b * n
    return out


# ----------------------------------------------------------- attention


def attention_apply(
    flat_normed: jax.Array,
    shapes: List[Tuple[int, int]],
    p: dict,
    cfg: BlockConfig,
    ropes: Sequence[Rope],
    compute_dtype: Optional[jnp.dtype],
    n_valids: Optional[Sequence[int]] = None,
) -> jax.Array:
    """qkv GEMM on the packed matrix, per-crop SDPA, packed out-proj —
    mirrors ``SelfAttention.forward_list`` (attention.py:98-108).

    TPU layout note: everything stays in (B, N, heads, head_dim) — q/k/v
    come from contiguous last-dim slices of the qkv output and attention
    runs via head-batched einsums (or the Pallas kernel, which block-
    indexes the head axis). The canonical (B, H, N, d) transpose would
    force two full relayouts of odd-N tensors per block, which measures
    as ~2x the encoder's non-GEMM time on v5e.
    """

    nh, hd = cfg.num_heads, cfg.head_dim
    hm = cfg.qkv_head_major
    qkv_p = p["qkv"]
    if cfg.mask_k_bias and qkv_p.get("bias") is not None:
        # LinearKMaskedBias (attention.py:26-38): the K third of the qkv
        # bias is multiplied by a zero mask every forward — the bias
        # stays trainable but K's slice gets zero value AND zero grad.
        # The mask is static (config-derived), so XLA constant-folds it.
        # Under the head-major TP layout the K columns sit per rank
        # group, so the mask tiles per group.
        dg = cfg.dim // hm
        mask = jnp.tile(jnp.concatenate(
            [jnp.ones((dg,), jnp.float32), jnp.zeros((dg,), jnp.float32),
             jnp.ones((dg,), jnp.float32)]
        ), hm)
        qkv_p = dict(qkv_p, bias=qkv_p["bias"] * mask)
    qkv_flat = linear(flat_normed, qkv_p, compute_dtype)
    # Megatron layout: packed rows are batch-major (shard over data);
    # the column-parallel qkv output features shard over model. Pinned
    # here because GSPMD propagation through the scan/remat backward
    # otherwise loses it ("[SPMD] Involuntary full rematerialization").
    qkv_flat = maybe_constrain(qkv_flat, DATA_AXIS, MODEL_AXIS)
    if n_valids is None:
        n_valids = [n for _, n in shapes]
    outs = []
    for (b, n), rope, n_valid in zip(shapes, ropes, n_valids):
        off = sum(bb * nn for bb, nn in shapes[: len(outs)])
        qkv = jax.lax.slice_in_dim(qkv_flat, off, off + b * n, axis=0)
        d = cfg.dim

        from vtp_tpu.ops.flash_attention import pallas_enabled

        if pallas_enabled():
            from vtp_tpu.ops.flash_attention import (
                fused_attention_supported,
                fused_qkv_rope_attention,
            )

            if fused_attention_supported((b, n, 3 * d), qkv.dtype, nh,
                                         qk_norm=cfg.use_qk_norm,
                                         head_major=hm):
                # fp32 (decode parity mode): follow the ambient matmul
                # precision so in-kernel dots match the XLA GEMMs
                # ('float32' -> 6-pass exact, 'high' -> 3-pass bf16x3)
                amb = jax.config.jax_default_matmul_precision or "float32"
                o = fused_qkv_rope_attention(
                    qkv.reshape(b, n, 3 * d),
                    rope[0] if rope is not None else None,
                    rope[1] if rope is not None else None,
                    nh,
                    q_scale=p["q_norm"]["scale"] if cfg.use_qk_norm else None,
                    k_scale=p["k_norm"]["scale"] if cfg.use_qk_norm else None,
                    n_valid=n_valid,
                    fp32_precision=amb,
                    head_shards=hm,
                )
                outs.append(o.reshape(b * n, cfg.dim))
                continue

        # two single-axis reshapes, not one (b*n, d) -> (b, n, nh, hd):
        # under explicit-sharding meshes a multi-axis split of a
        # sharded operand is a ShardingTypeError (the rows carry @data
        # from an upstream shard_map-dispatched kernel)
        def _split(t):
            return t.reshape(b, n, d).reshape(b, n, nh, hd)

        if hm > 1:
            # head-major TP layout: columns are hm rank-major packed
            # groups [Q_r|K_r|V_r]; regroup to the canonical head order
            # (rank r holds the contiguous heads [r*H/hm, (r+1)*H/hm),
            # so the (hm, d/hm) merge lands features at h*hd + i). GSPMD
            # keeps the model sharding on the merged head dim.
            dg = d // hm
            grp = qkv.reshape(b, n, 3 * d).reshape(b, n, hm, 3 * dg)
            take = lambda lo, hi: jax.lax.slice_in_dim(
                grp, lo, hi, axis=-1).reshape(b, n, d).reshape(b, n, nh, hd)
            q = take(0, dg)
            k = take(dg, 2 * dg)
            v = take(2 * dg, 3 * dg)
        else:
            q = _split(jax.lax.slice_in_dim(qkv, 0, d, axis=-1))
            k = _split(jax.lax.slice_in_dim(qkv, d, 2 * d, axis=-1))
            v = _split(jax.lax.slice_in_dim(qkv, 2 * d, 3 * d, axis=-1))
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"]["scale"])
            k = rms_norm(k, p["k_norm"]["scale"])
        if rope is not None:
            sin, cos = rope
            q, k = apply_rope_bnhd(q, k, sin, cos)
        if compute_dtype is not None:
            q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
        o = sdpa_bnhd(q, k, v, n_valid=n_valid)
        # single-axis merges (see _split above)
        outs.append(o.reshape(b, n, cfg.dim).reshape(b * n, cfg.dim))
    out_flat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # Named for remat policies ("attn"/"dots_attn" in remat_wrap): saving
    # the attention output keeps the backward from re-running the flash
    # kernel (the proj dW needs it as an operand).
    out_flat = checkpoint_name(out_flat, "attn_out")
    # attention output heads live on the model axis (row-parallel proj
    # input); its GEMM emits partial sums that GSPMD all-reduces
    out_flat = maybe_constrain(out_flat, DATA_AXIS, MODEL_AXIS)
    return linear(out_flat, p["proj"], compute_dtype)


def apply_rope_bnhd(q: jax.Array, k: jax.Array, sin: jax.Array, cos: jax.Array):
    """RoPE on (B, N, H, hd) with full-length (N, hd) tables (prefix
    pre-padded with identity rotation)."""
    from vtp_tpu.ops.rope import rope_apply

    q_dtype, k_dtype = q.dtype, k.dtype
    s = sin[None, :, None, :]
    c = cos[None, :, None, :]
    q = rope_apply(q.astype(sin.dtype), s, c).astype(q_dtype)
    k = rope_apply(k.astype(sin.dtype), s, c).astype(k_dtype)
    return q, k


def sdpa_bnhd(q: jax.Array, k: jax.Array, v: jax.Array,
              n_valid: int = 0) -> jax.Array:
    """SDPA over (B, N, H, hd) without host-side transposes.
    ``n_valid`` masks trailing padded key columns (token alignment).

    Under an ambient mesh with a ``seq`` axis (context parallelism,
    ``parallel.mesh.make_cp_mesh``) the token dim shards over the mesh
    and attention rides a CP arm (ops/ring_attention.py): Ulysses
    all-to-all head re-sharding when heads divide the axis (2
    collectives, full-N scores over H/S local heads), else the ppermute
    KV ring ((N/S, N/S) score blocks, unbounded N). The arm preference
    comes from ``make_cp_mesh(mode=...)`` (registered per mesh
    signature; flipping it clears the jit caches, so this trace-time
    read is never stale — parallel/mesh.cp_mode_for)."""

    from vtp_tpu.ops.flash_attention import pallas_enabled

    from vtp_tpu.parallel.mesh import active_mesh, cp_mode_for
    mesh = active_mesh()
    if mesh is not None:
        from vtp_tpu.ops.ring_attention import (
            ring_attention_bnhd,
            ring_supported,
            ulysses_attention_bnhd,
            ulysses_supported,
        )

        mode = cp_mode_for(mesh)
        if (mode in ("auto", "ulysses")
                and ulysses_supported(q, mesh, n_valid)):
            return ulysses_attention_bnhd(q, k, v, n_valid=n_valid, mesh=mesh)
        if mode != "ulysses" and ring_supported(q, mesh, n_valid):
            return ring_attention_bnhd(q, k, v, n_valid=n_valid, mesh=mesh)

    n = q.shape[1]
    if (pallas_enabled() and q.dtype == jnp.bfloat16
            and (not n_valid or n_valid == n)):
        from vtp_tpu.ops.flash_attention import flash_attention_bnhd, flash_supported_bnhd

        if flash_supported_bnhd(q, k, v):
            return flash_attention_bnhd(q, k, v)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if n_valid and n_valid != n:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _ffn_apply(flat: jax.Array, p: dict, cfg: BlockConfig,
               compute_dtype: Optional[jnp.dtype]) -> jax.Array:
    if cfg.ffn_layer == "mlp":
        return mlp(flat, p, ACT[cfg.act], compute_dtype)
    return swiglu(flat, p, compute_dtype)


def _maybe_ls(h: jax.Array, p: dict, name: str) -> jax.Array:
    ls = p.get(name)
    return h * ls["gamma"] if ls is not None else h


# ---------------------------------------------------------- block apply


def block_apply(
    xs: Tuple[jax.Array, ...],
    p: dict,
    cfg: BlockConfig,
    ropes: Sequence[Rope],
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    drop_ratio: float = 0.0,
    training: bool = False,
    key: Optional[jax.Array] = None,
    drop_shards: int = 1,
    n_valids: Optional[Sequence[int]] = None,
) -> Tuple[jax.Array, ...]:
    """Pre-norm block: ``x + ls1(attn(norm1 x)); x + ls2(ffn(norm2 x))``
    over a tuple of crop tensors (block.py:290-296)."""
    if training and drop_ratio > 0.0 and key is not None:
        return _block_apply_droppath(
            xs, p, cfg, ropes, compute_dtype=compute_dtype,
            drop_ratio=drop_ratio, key=key, drop_shards=drop_shards,
            n_valids=n_valids,
        )

    # residual streams: batch over data, features replicated (Megatron
    # activations are full between the column/row-parallel GEMM pairs);
    # under sequence_parallel() the token dim also shards over model
    res_spec = lambda x: constrain_residual(x, token_axis=1)
    flat, shapes = pack(xs)
    n1 = apply_norm(flat, p["norm1"], cfg.norm_kind, cfg.eps)
    attn_out = _maybe_ls(attention_apply(n1, shapes, p["attn"], cfg, ropes, compute_dtype, n_valids), p, "ls1")
    xs = tuple(res_spec(x + r) for x, r in zip(xs, unpack(attn_out, shapes)))

    flat2, _ = pack(xs)
    n2 = apply_norm(flat2, p["norm2"], cfg.norm_kind, cfg.eps)
    ffn_out = _maybe_ls(_ffn_apply(n2, p["mlp"], cfg, compute_dtype), p, "ls2")
    return tuple(res_spec(x + r) for x, r in zip(xs, unpack(ffn_out, shapes)))


def block_apply_flat(
    flat: jax.Array,
    p: dict,
    cfg: BlockConfig,
    ropes: Sequence[Rope],
    shapes: List[Tuple[int, int]],
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    n_valids: Optional[Sequence[int]] = None,
) -> jax.Array:
    """``block_apply`` on an already-packed ``(sum B_i*N_i, D)`` token
    matrix. Bit-identical to packing/unpacking around ``block_apply``
    (pack is a deterministic concat of reshapes and every op here is
    elementwise over rows or already packed-native), but the residual
    stream stays packed across the whole depth stack — the reference
    re-packs per layer (cat_keep_shapes in block.py:235-298), which
    measured 13.8 ms/step of pure copy traffic in the v5e SSL train
    step (PERF.md round 3). Used by ``scan_blocks`` whenever drop-path
    is off; drop-path gathers per-crop batch subsets and keeps the
    (B, N, D) carry."""
    res_spec = constrain_residual
    n1 = apply_norm(flat, p["norm1"], cfg.norm_kind, cfg.eps)
    attn_out = _maybe_ls(
        attention_apply(n1, shapes, p["attn"], cfg, ropes, compute_dtype, n_valids),
        p, "ls1",
    )
    flat = res_spec(flat + attn_out)
    n2 = apply_norm(flat, p["norm2"], cfg.norm_kind, cfg.eps)
    ffn_out = _maybe_ls(_ffn_apply(n2, p["mlp"], cfg, compute_dtype), p, "ls2")
    return res_spec(flat + ffn_out)


def drop_keep_count(batch: int, drop_ratio: float, shards: int = 1) -> int:
    """Per-shard keep count: deterministic equal allocation of the
    reference's global keep (block.py:55-66), rounded down to keep
    shapes static and identical across shards."""
    if shards <= 1:
        return max(int(batch * (1.0 - drop_ratio)), 1)
    global_keep = max(int(batch * shards * (1.0 - drop_ratio)), shards)
    return min(max(global_keep // shards, 1), batch)


def sample_drop_indices(key: jax.Array, batch: int, keep: int) -> jax.Array:
    return jax.random.permutation(key, batch)[:keep]


def _residual_scatter(x: jax.Array, res: jax.Array, idx: jax.Array, scale: float) -> jax.Array:
    """``torch.index_add(x, 0, ls(res), idx, alpha=scale)`` (block.py:211-217)."""
    return x.at[idx].add((scale * res.astype(jnp.float32)).astype(x.dtype))


def _block_apply_droppath(
    xs, p, cfg, ropes, *, compute_dtype, drop_ratio, key, drop_shards,
    n_valids=None,
) -> Tuple[jax.Array, ...]:
    keys = jax.random.split(key, 2 * len(xs))

    # attention branch on a random batch subset of each crop
    idx1, scales1 = [], []
    for i, x in enumerate(xs):
        b = x.shape[0]
        keep = drop_keep_count(b, drop_ratio, drop_shards)
        idx1.append(sample_drop_indices(keys[i], b, keep))
        scales1.append(b / keep)
    # keep the gathered batch subsets batch-sharded: the x[idx] gather's
    # output sharding is data-dependent to GSPMD, and without the pin
    # the scan/remat backward replicates it ("[SPMD] Involuntary full
    # rematerialization" in the dryrun artifact)
    sub_spec = lambda t: maybe_constrain(t, DATA_AXIS, None, None)
    sub = [sub_spec(x[ix]) for x, ix in zip(xs, idx1)]
    sub_ropes = [_index_rope(r, ix) for r, ix in zip(ropes, idx1)]
    flat, shapes = pack(sub)
    n1 = apply_norm(flat, p["norm1"], cfg.norm_kind, cfg.eps)
    attn_out = _maybe_ls(attention_apply(n1, shapes, p["attn"], cfg, sub_ropes, compute_dtype, n_valids), p, "ls1")
    xs = tuple(
        sub_spec(_residual_scatter(x, r, ix, s))
        for x, r, ix, s in zip(xs, unpack(attn_out, shapes), idx1, scales1)
    )

    # ffn branch on a fresh subset
    idx2, scales2 = [], []
    for i, x in enumerate(xs):
        b = x.shape[0]
        keep = drop_keep_count(b, drop_ratio, drop_shards)
        idx2.append(sample_drop_indices(keys[len(xs) + i], b, keep))
        scales2.append(b / keep)
    sub2 = [sub_spec(x[ix]) for x, ix in zip(xs, idx2)]
    flat2, shapes2 = pack(sub2)
    n2 = apply_norm(flat2, p["norm2"], cfg.norm_kind, cfg.eps)
    ffn_out = _maybe_ls(_ffn_apply(n2, p["mlp"], cfg, compute_dtype), p, "ls2")
    return tuple(
        sub_spec(_residual_scatter(x, r, ix, s))
        for x, r, ix, s in zip(xs, unpack(ffn_out, shapes2), idx2, scales2)
    )


def _index_rope(rope: Rope, idx: jax.Array) -> Rope:
    if rope is None:
        return None
    sin, cos = rope
    if sin.ndim == 4:  # per-sample rope tables (unused by shipped models)
        return sin[idx], cos[idx]
    return rope


# ------------------------------------------------------------ scanning


def remat_wrap(body, remat):
    """Apply gradient checkpointing to a scan body.

    ``remat`` selects the save policy:
      False            — save everything (no remat; peak memory, min FLOPs)
      True / "full"    — save nothing, recompute the whole block in the
                         backward (the reference's HF gradient-checkpointing
                         analogue, modeling_vtp.py:37)
      "dots"           — save matmul outputs, recompute only elementwise ops
                         (norms/activations/residuals). Memory sits between
                         the two, but the backward skips re-running the GEMMs.
      "attn"           — save only the attention outputs (tagged
                         "attn_out" in attention_apply): the backward
                         recomputes the cheap-to-refuse GEMMs but never
                         re-runs the flash-attention forward kernel.
      "dots_attn"      — union of "dots" and "attn".

    Measured on v5e (VTP-B CLIP+rec, batch 32): GEMM recompute is nearly
    free (fuses into the backward), so "dots" loses to "full" once its
    save-buffer traffic is counted; "attn" targets the one recompute
    that is NOT free (the Pallas kernel, ~9 ms/step).
    """
    if remat is False or remat is None:
        return body
    if remat is True or remat == "full":
        return jax.checkpoint(body)
    if remat == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    if remat == "attn":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.save_only_these_names("attn_out")
        )
    if remat == "dots_attn":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_out"),
            ),
        )
    raise ValueError(f"unknown remat mode: {remat!r}")


def scan_blocks(
    xs: Tuple[jax.Array, ...],
    stacked: dict,
    cfg: BlockConfig,
    ropes: Sequence[Rope],
    *,
    depth: int,
    compute_dtype: Optional[jnp.dtype] = None,
    drop_ratio: float = 0.0,
    training: bool = False,
    key: Optional[jax.Array] = None,
    drop_shards: int = 1,
    collect_last: int = 0,
    remat: Union[bool, str] = False,
    n_valids: Optional[Sequence[int]] = None,
    unroll: bool = False,
) -> Tuple[Tuple[jax.Array, ...], Optional[List[Tuple[jax.Array, ...]]]]:
    """Run ``depth`` stacked blocks under ``lax.scan``.

    When ``collect_last > 0`` the trailing ``collect_last`` block outputs
    are also returned (for get_intermediate_layers), using a second scan
    segment so earlier activations are never materialized.

    ``remat`` selects the gradient-checkpoint policy (remat_wrap) — the
    jax.checkpoint analogue of the reference's HF gradient-checkpointing
    support (modeling_vtp.py:37).

    ``unroll=True`` runs the depth loop as an unrolled Python loop
    instead of ``lax.scan``. Forward results are identical; the win is
    the *backward*: the scan transpose accumulates weight grads through
    per-iteration dynamic-update-slices into the stacked (depth, ...)
    buffers, which measures 20-25%% slower than the freely scheduled
    unrolled backward on v5e (trunk12 fwd+bwd 40.2 vs 45.9 ms under
    remat="attn"). Compile time grows with depth — prefer it for
    training steps, keep scan for inference.

    ``unroll=k`` (an int chunk size dividing ``depth``) is the middle
    ground: ``lax.scan`` over ``depth/k`` segments whose body Python-
    unrolls ``k`` layers — the backward's stacked-grad DUS accumulation
    amortizes over k layers while compile time stays ~k-layers-sized
    instead of depth-sized (the full unroll compiles 3-14 min at
    VTP-B/L depths; see PERF.md round 3 for the Pareto).
    """
    use_drop = training and drop_ratio > 0.0 and key is not None

    if not use_drop and collect_last <= 0:
        # pipeline-parallel arm: under an ambient mesh with a `pipe`
        # axis (parallel/pipeline.make_pp_mesh + jax.set_mesh) the depth
        # loop stage-shards over it with the GPipe ppermute schedule —
        # same ambient-mesh contract as the CP dispatch in sdpa_bnhd.
        # Returns None (-> sequential fallback) when the layout is
        # unsupported (depth or batch indivisible, drop-path on).
        from vtp_tpu.parallel.mesh import PIPE_AXIS, active_mesh, mesh_axis_size

        _mesh = active_mesh()
        if mesh_axis_size(_mesh, PIPE_AXIS) > 1:
            from vtp_tpu.parallel.pipeline import maybe_pipeline_blocks

            out = maybe_pipeline_blocks(
                xs, stacked, cfg, ropes, depth=depth,
                compute_dtype=compute_dtype, n_valids=n_valids, remat=remat,
            )
            if out is not None:
                return out, None

    layer_keys = (
        jax.random.split(key, depth) if use_drop
        else jnp.zeros((depth, 2), jnp.uint32)
    )

    if use_drop:
        # drop-path gathers per-crop batch subsets: keep the (B, N, D)
        # tuple carry so the residual scatter stays per crop
        carry0: object = xs
        finish = lambda c: c

        def body(carry, layer):
            params_i, key_i = layer
            out = block_apply(
                carry, params_i, cfg, ropes,
                compute_dtype=compute_dtype, drop_ratio=drop_ratio,
                training=training, key=key_i,
                drop_shards=drop_shards, n_valids=n_valids,
            )
            return out, None
    else:
        # pack ONCE for the whole stack (see block_apply_flat)
        flat0, shapes = pack(xs)
        carry0 = flat0
        finish = lambda c: tuple(unpack(c, shapes))

        def body(carry, layer):
            params_i, _ = layer
            out = block_apply_flat(
                carry, params_i, cfg, ropes, shapes,
                compute_dtype=compute_dtype, n_valids=n_valids,
            )
            return out, None

    body = remat_wrap(body, remat)

    def body_collect(carry, layer):
        out, _ = body(carry, layer)
        return out, out

    take = lambda tree, lo, hi: jax.tree.map(lambda a: a[lo:hi], tree)
    at = lambda tree, i: jax.tree.map(lambda a: a[i], tree)

    chunk = 0
    if unroll is True or unroll == depth:
        chunk = depth  # full Python unroll
    elif isinstance(unroll, int) and unroll > 1:
        if depth % unroll:
            raise ValueError(f"unroll chunk {unroll} must divide depth {depth}")
        chunk = unroll

    if chunk == depth:
        collected = []
        carry = carry0
        for i in range(depth):
            carry, _ = body(carry, (at(stacked, i), layer_keys[i]))
            if i >= depth - collect_last:
                collected.append(finish(carry))
        return finish(carry), (collected if collect_last > 0 else None)

    if chunk > 1:
        if collect_last > 0:
            raise ValueError("collect_last requires scan or full unroll")
        n_seg = depth // chunk
        seg_stacked = jax.tree.map(
            lambda a: a.reshape(n_seg, chunk, *a.shape[1:]), stacked
        )
        seg_keys = layer_keys.reshape(n_seg, chunk, *layer_keys.shape[1:])

        def seg_body(carry, seg):
            params_c, keys_c = seg
            for j in range(chunk):
                carry, _ = body(carry, (at(params_c, j), keys_c[j]))
            return carry, None

        carry, _ = jax.lax.scan(seg_body, carry0, (seg_stacked, seg_keys))
        return finish(carry), None

    if collect_last <= 0:
        carry, _ = jax.lax.scan(body, carry0, (stacked, layer_keys))
        return finish(carry), None

    split = depth - collect_last
    carry = carry0
    if split > 0:
        carry, _ = jax.lax.scan(body, carry, (take(stacked, 0, split), layer_keys[:split]))
    carry, ys = jax.lax.scan(body_collect, carry, (take(stacked, split, depth), layer_keys[split:]))
    # ys: carry pytree with a leading collect_last axis -> list of tuples
    collected = [finish(jax.tree.map(lambda a: a[i], ys)) for i in range(collect_last)]
    return finish(carry), collected
