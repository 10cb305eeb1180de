"""Pallas TPU flash-attention kernels.

Replace the reference's ``F.scaled_dot_product_attention`` hot kernel
(vtp/models/layers/attention.py:124) for the ViT trunk, pixel decoder,
and DiT. VTP sequences are short (257 tokens at 256px, 77 for text)
with head_dim 64 across every released size.

The production path is ``fused_qkv_rope_attention``: one grid step per
batch row reads the raw (B, N, 3D) qkv GEMM output, does qkv-split +
optional qk-RMSNorm + RoPE + flash softmax per head on VMEM column
slices with NO sequence padding (exact-dim blocks are legal in Mosaic
and measure 4x faster than 128-multiple padding), and writes the
(B, N, D) output once. bf16 operands use DEFAULT-precision MXU dots
with fp32 accumulation; fp32 (the decoder's parity mode) uses HIGHEST
(6-pass, fp32-accurate). A custom_vjp supplies the backward via a
pure-JAX recompute. ``flash_attention``/``flash_attention_bnhd`` are
earlier standalone variants kept for aligned-shape callers; the einsum
path in ``vtp_tpu.ops.attention`` is the parity oracle.

SPMD: ``pallas_call`` has no GSPMD partitioning rule, so under a
multi-device mesh (ambient via ``jax.set_mesh``) every kernel here runs
per-shard inside ``jax.shard_map`` over the data (batch) axis — batch
rows are independent, mirroring how the reference's SDPA composes with
DDP for free (vtp/models/layers/attention.py:124). Unsupported layouts
(batch not divisible by the data axis, tensor-parallel model axis) fall
back to the XLA path, which GSPMD shards correctly (see ``_mesh_ok``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from vtp_tpu.ops.dispatch import kernel_dispatch

_LANE = 128
_MAX_SEQ_FULL = 2048  # beyond this, fall back to XLA attention for now


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pallas_enabled() -> bool:
    """Whether kernel dispatch sites should consider the Pallas path:
    on the TPU backend, or anywhere under interpret mode (used by the
    CPU-mesh kernel×sharding tests and the driver dryrun's kernel leg).
    ``disable_flash`` force-picks the XLA fallback (the parity oracle).
    Both come from :mod:`vtp_tpu.ops.dispatch` — env at process start,
    :func:`~vtp_tpu.ops.dispatch.configure_kernels` at runtime (which
    clears jit caches, so this trace-time read is never stale)."""
    d = kernel_dispatch()
    if d.disable_flash:
        return False
    if d.interpret:
        return True
    return jax.default_backend() == "tpu"


def _mesh_batch_shards():
    """(ambient mesh, data-axis size); (None, 1) when single-device."""
    from vtp_tpu.parallel.mesh import DATA_AXIS, active_mesh, mesh_axis_size

    mesh = active_mesh()
    if mesh is None:
        return None, 1
    return mesh, mesh_axis_size(mesh, DATA_AXIS)


def _mesh_model_size() -> int:
    """Model-axis size of the ambient mesh (1 when single-device)."""
    from vtp_tpu.parallel.mesh import MODEL_AXIS, mesh_axis_size

    mesh, _ = _mesh_batch_shards()
    return 1 if mesh is None else mesh_axis_size(mesh, MODEL_AXIS)


def _mesh_ok(batch: int, heads: int = 0) -> bool:
    """Kernel×mesh composability gate. ``pallas_call`` has no SPMD
    partitioning rule (see ops/fused_ce.py), so under a multi-device
    mesh the attention kernels run per-shard inside ``jax.shard_map``
    over the data (batch) axis — this requires a clean batch split.

    Tensor-parallel meshes (model axis > 1): attention heads are
    embarrassingly parallel, and under the Megatron layout the qkv
    features already live on the model axis, so kernels whose callers
    declare a shardable head axis (``heads > 0``, the ``bnhd``/``bhnd``
    entries) run per-shard over ``(data, model)`` with ``heads %
    model == 0`` — round-5; measured XLA-fallback cost was 47% on the
    vtp-base step (PERF.md round 5, traces/r5_tp_disengage.json). The
    FUSED qkv+rope+attention kernel needs more than a shardable head
    dim: its input is the packed (B, N, [Q|K|V]) GEMM output, whose
    contiguous model-axis column shards straddle the Q/K/V thirds
    under the canonical layout. With the HEAD-MAJOR qkv weight
    permutation (parallel.sharding.qkv_head_major, declared via
    ``fused_attention_supported(head_major=...)``) each shard is a
    canonical packed qkv for its heads and the fused kernels engage
    per-shard too — the canonical-layout TP fallback remains only for
    unpermuted checkpoints."""
    from vtp_tpu.parallel.mesh import MODEL_AXIS, SEQ_AXIS, mesh_axis_size

    mesh, n = _mesh_batch_shards()
    if mesh is None:
        return True
    m = mesh_axis_size(mesh, MODEL_AXIS)
    if m > 1 and (heads <= 0 or heads % m):
        return False
    if mesh_axis_size(mesh, SEQ_AXIS) > 1:
        # context-parallel mesh: tokens shard over `seq` and attention
        # rides the ring (ops/ring_attention.py via sdpa_bnhd) — the
        # batch-sharded kernel would replicate every token shard.
        return False
    return n == 1 or batch % n == 0


def _dispatch_sharded(fn, inputs, batched, out_ranks, head_axis=None):
    """Run ``fn(*inputs)`` directly (single-device) or inside
    ``jax.shard_map`` over the data (and, optionally, model) axes of
    the ambient mesh.

    ``batched`` flags which inputs carry a leading batch dim (sharded
    over ``data``; the rest are replicated). ``out_ranks`` gives the
    rank of each batch-leading output (list => fn returns a list).
    ``head_axis`` (int) names the dimension of every batched input AND
    output that carries attention heads (contiguous per-head chunks for
    flattened ``H*d`` feature dims): under a model-parallel mesh that
    dimension shards over ``model`` — heads are embarrassingly parallel,
    so the per-shard kernel body just sees ``H / model`` heads. Callers
    must have passed the :func:`_mesh_ok` gate (which requires
    ``heads % model == 0`` whenever ``head_axis`` dispatch is used)."""
    mesh, n = _mesh_batch_shards()
    m = _mesh_model_size()
    if mesh is None or (n <= 1 and m <= 1):
        return fn(*inputs)
    from jax.sharding import PartitionSpec as P

    from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    def spec(rank, is_batched):
        if not is_batched:
            return P(*(None,) * rank)
        parts = [DATA_AXIS] + [None] * (rank - 1)
        if m > 1 and head_axis is not None:
            parts[head_axis] = MODEL_AXIS
        return P(*parts)

    in_specs = tuple(
        spec(a.ndim, b) for a, b in zip(inputs, batched)
    )
    out_specs = tuple(spec(r, True) for r in out_ranks)
    if len(out_specs) == 1:
        out_specs = out_specs[0]
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        # pallas_call's out ShapeDtypeStruct carries no vma annotation
        check_vma=False,
    )(*inputs)


def flash_supported(q, k, v, *, is_causal: bool = False) -> bool:
    if is_causal:
        return False  # causal path (text tower) uses the XLA fallback today
    if q.ndim != 4 or q.shape != k.shape or k.shape != v.shape:
        return False
    if q.dtype != jnp.bfloat16:
        # fp32 attention (decoder parity mode) stays on the XLA path,
        # which honors jax.default_matmul_precision('float32'); Mosaic
        # only lowers DEFAULT/HIGHEST dot precisions.
        return False
    if not _mesh_ok(q.shape[0], heads=q.shape[1]):
        return False
    n = q.shape[2]
    return 2 <= n <= _MAX_SEQ_FULL and q.shape[3] in (32, 64, 128)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0]  # (Np, d) — bf16 operands, fp32 MXU accumulation
    k = k_ref[0]
    v = v_ref[0]  # (Np, d) in value dtype

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # (Np, Np)

    n_pad = scores.shape[-1]
    if n_pad != n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(v.dtype)

    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def fused_attention_supported(qkv_shape, dtype, num_heads: int,
                              qk_norm: bool = False,
                              head_major: int = 1) -> bool:
    """(B, N, 3D) fused qkv+rope+attention kernel support check.
    bf16 uses DEFAULT-precision dots; fp32 (the decoder's parity mode)
    uses HIGHEST (6-pass, fp32-accurate). ``qk_norm`` accounts for the
    slab-norm arm's extra VMEM: the (D, D) block-diagonal stats matrix
    plus fp32 (N, D) rsqrt/normalized intermediates.

    ``head_major`` declares the caller's qkv parameter layout: the TP
    factor the packed qkv GEMM columns are permuted for
    (``parallel.sharding.qkv_head_major`` — rank-major ``[Q_r|K_r|V_r]``
    groups). Under a model-parallel mesh of exactly that size each
    model shard's contiguous column chunk is itself a canonical packed
    qkv for ``H / model`` heads, so the kernel engages per-shard over
    ``(data, model)`` with zero extra collectives. Any other
    combination — permuted weights without the matching mesh, or a
    model axis over canonical (``head_major == 1``) weights, whose
    contiguous column shards straddle the Q/K/V thirds — falls back to
    the XLA path."""
    if dtype == jnp.bfloat16:
        itemsize = 2
    elif dtype == jnp.float32:
        itemsize = 4
    else:
        return False
    B, N, three_d = qkv_shape
    D = three_d // 3
    d = D // num_heads
    if d not in (32, 64, 128) or d * num_heads * 3 != three_d:
        return False
    if not (2 <= N <= _MAX_SEQ_FULL):
        return False
    m = _mesh_model_size()
    if m > 1:
        # model-parallel mesh: engage only with the matching head-major
        # weight layout and a clean per-shard head count
        if head_major != m or num_heads % m:
            return False
        if not _mesh_ok(B, heads=num_heads):
            return False
    else:
        if head_major > 1:
            # permuted weights without the matching mesh: the packed
            # layout is rank-grouped, not [Q|K|V] — XLA split handles it
            return False
        if not _mesh_ok(B):
            return False
    shards = m if m > 1 else 1
    Dl, three_dl = D // shards, three_d // shards
    vmem = (N * three_dl * itemsize) * 2 + 2 * N * N * 4
    if qk_norm:
        vmem += Dl * Dl * itemsize + 4 * N * Dl * 4
    return vmem < 12 * 1024 * 1024


def _fused_bwd_qk_norm_fits(qkv_shape, head_shards: int = 1) -> bool:
    """VMEM gate for the qk-norm backward arm: on top of the plain
    backward's footprint it holds the (D, D) block-diagonal stats
    matrix plus ~4 fp32 (N, D) norm intermediates (r/n/dn/t per slab,
    liveness-overlapped). Falls back to the recompute VJP above it.
    Per-shard sizes under head-major model sharding (``head_shards``)."""
    _, N, three_d = qkv_shape
    three_d //= head_shards
    D = three_d // 3
    vmem = (N * three_d * 2) * 2 + 2 * N * N * 4 \
        + D * D * 2 + 6 * N * D * 4
    return vmem < 14 * 1024 * 1024


def _fused_reference_impl(qkv, sin, cos, q_scale, k_scale, num_heads: int,
                          n_valid: int = 0, is_causal: bool = False,
                          head_shards: int = 1):
    """Pure-JAX composition matching the fused kernel's math — used as
    the differentiation rule (custom_vjp backward) since Mosaic's
    lane-roll has no VJP. Recomputes the forward; a dedicated backward
    kernel is future work. ``n_valid`` masks padded key columns (token
    rows beyond the real sequence exist only for sublane alignment).
    ``head_shards``: the head-major TP layout factor of the packed qkv
    columns (rank-major groups; parallel.sharding.qkv_head_major) —
    the split below regroups them to the canonical head order, which
    GSPMD keeps model-sharded on the head dim."""
    B, N, three_d = qkv.shape
    D = three_d // 3
    H = num_heads
    d = D // H
    if head_shards > 1:
        dl = D // head_shards
        grp = qkv.reshape(B, N, head_shards, 3 * dl)
        take = lambda lo, hi: jax.lax.slice_in_dim(
            grp, lo, hi, axis=-1).reshape(B, N, D).reshape(B, N, H, d)
        q = take(0, dl)
        k = take(dl, 2 * dl)
        v = take(2 * dl, 3 * dl)
    else:
        q = qkv[..., :D].reshape(B, N, H, d)
        k = qkv[..., D:2 * D].reshape(B, N, H, d)
        v = qkv[..., 2 * D:].reshape(B, N, H, d)
    if q_scale is not None:
        from vtp_tpu.ops.norms import rms_norm

        q = rms_norm(q, q_scale).astype(qkv.dtype)
        k = rms_norm(k, k_scale).astype(qkv.dtype)
    if sin is not None:
        from vtp_tpu.ops.rope import rope_apply

        s = sin[None, :, None, :]
        c = cos[None, :, None, :]
        rdt = jnp.bfloat16
        q = rope_apply(q.astype(rdt), s.astype(rdt), c.astype(rdt)).astype(qkv.dtype)
        k = rope_apply(k.astype(rdt), s.astype(rdt), c.astype(rdt)).astype(qkv.dtype)
    scale = d**-0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if n_valid and n_valid != N:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    if is_causal:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return o.astype(qkv.dtype).reshape(B, N, D)


@functools.lru_cache(maxsize=None)
def _fused_with_vjp(num_heads: int, n_valid: int, is_causal: bool = False,
                    fp32_precision: str = "float32", head_shards: int = 1):
    def fwd_only(qkv, sin, cos, q_scale, k_scale):
        return _fused_kernel_call(qkv, sin, cos, num_heads, q_scale, k_scale,
                                  n_valid=n_valid, is_causal=is_causal,
                                  fp32_precision=fp32_precision,
                                  head_shards=head_shards)

    f = jax.custom_vjp(fwd_only)

    def fwd(qkv, sin, cos, q_scale, k_scale):
        return fwd_only(qkv, sin, cos, q_scale, k_scale), (qkv, sin, cos, q_scale, k_scale)

    def bwd(res, g):
        qkv, sin, cos, q_scale, k_scale = res
        zt = (lambda t: None if t is None else jnp.zeros_like(t))
        use_kernel = (qkv.dtype == jnp.bfloat16
                      and not kernel_dispatch().disable_bwd_kernel)
        if use_kernel and q_scale is None:
            # dedicated Pallas backward kernel (no recompute round-trip
            # through XLA's qkv-split/relayout dataflow). sin/cos get
            # zero cotangents: RoPE periods are a non-trained buffer in
            # the reference (embeddings.py:124-128) — the recompute VJP
            # used to leak real gradients into them.
            d_qkv = _fused_bwd_kernel_call(qkv, g, sin, cos, num_heads,
                                           n_valid=n_valid, is_causal=is_causal,
                                           head_shards=head_shards)
            return d_qkv, zt(sin), zt(cos), None, None
        if (use_kernel and q_scale is not None
                and _fused_bwd_qk_norm_fits(qkv.shape, head_shards)):
            # qk-norm arm (the DiT training path): same kernel, plus
            # in-kernel RMSNorm adjoint and per-batch scale-grad rows
            d_qkv, dws = _fused_bwd_kernel_call(
                qkv, g, sin, cos, num_heads, q_scale, k_scale,
                n_valid=n_valid, is_causal=is_causal,
                head_shards=head_shards)
            d = q_scale.shape[0]
            dwq = dws[:, 0, :].sum(0).reshape(num_heads, d).sum(0)
            dwk = dws[:, 1, :].sum(0).reshape(num_heads, d).sum(0)
            return (d_qkv, zt(sin), zt(cos),
                    dwq.astype(q_scale.dtype), dwk.astype(k_scale.dtype))
        _, vjp = jax.vjp(
            lambda *a: _fused_reference_impl(
                *a, num_heads=num_heads, n_valid=n_valid, is_causal=is_causal,
                head_shards=head_shards,
            ),
            *res,
        )
        d_qkv, d_sin, d_cos, d_qs, d_ks = vjp(g)
        # RoPE periods are a non-trained buffer in the reference
        # (embeddings.py:124-128): zero the table cotangents here too,
        # so training semantics don't depend on which arm (kernel vs
        # recompute fallback) the dispatch picked.
        return d_qkv, zt(sin) if d_sin is not None else None, \
            zt(cos) if d_cos is not None else None, d_qs, d_ks

    f.defvjp(fwd, bwd)
    return f


def fused_qkv_rope_attention(
    qkv: jax.Array,
    sin, cos,
    num_heads: int,
    q_scale=None, k_scale=None,
    n_valid: int = 0,
    is_causal: bool = False,
    fp32_precision: str = "float32",
    head_shards: int = 1,
) -> jax.Array:
    """Differentiable wrapper: Pallas kernel forward, pure-JAX VJP.
    ``n_valid`` (static) masks trailing padded key columns; ``is_causal``
    applies in-kernel causal masking (the text tower's mask,
    text_transformer.py:334-338, without materializing it);
    ``fp32_precision`` selects the fp32 dot mode ('float32' = 6-pass
    exact, 'high' = 3-pass) to match the ambient XLA matmul precision.
    ``head_shards`` (static): the head-major TP layout factor of the
    qkv columns — must equal the ambient mesh's model-axis size when
    > 1 (gate with :func:`fused_attention_supported`); forward and both
    backward kernels then run per-shard over ``(data, model)``."""
    return _fused_with_vjp(num_heads, int(n_valid), bool(is_causal),
                           str(fp32_precision), int(head_shards))(
        qkv, sin, cos, q_scale, k_scale)


def _fused_kernel_call(
    qkv: jax.Array,          # (B, N, 3*H*d) raw qkv-projection output
    sin, cos,                # (N, d) full-length tables (prefix padded) or None
    num_heads: int,
    q_scale=None, k_scale=None,  # optional per-head-dim RMS-norm scales (d,)
    n_valid: int = 0,        # mask key columns >= n_valid (0 = all valid)
    is_causal: bool = False,
    fp32_precision: str = "float32",  # fp32 dot mode: float32 | high
    head_shards: int = 1,    # head-major TP layout factor (= model axis)
) -> jax.Array:
    """Fused qkv-split + (optional qk-RMSNorm) + RoPE + flash attention.

    Motivation (measured on v5e, VTP-L shapes): splitting qkv into
    (B, N, H, d) tensors and applying rope as XLA ops costs ~2.3 ms per
    layer in strided copies and sub-128-lane relayouts — 6x the
    attention math itself. This kernel reads the qkv GEMM output
    directly from HBM once, does everything per (batch, head) on
    VMEM-resident column slices, and writes the (B, N, H*d) attention
    output once. RoPE's rotate-half runs as lane-roll + sign flip.

    Numerics identical to the reference path: bf16 operands, fp32
    score accumulation and softmax, probs cast to bf16 for PV.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Per-SHARD sizes: under head-major TP (head_shards = model-axis
    # size) each model shard's contiguous qkv column chunk is a
    # canonical packed qkv for H/shards heads, so the whole kernel body
    # and its specs are built local and dispatched over (data, model).
    B, N, three_d = qkv.shape
    if head_shards > 1 and _mesh_model_size() != head_shards:
        raise ValueError(
            f"head_shards={head_shards} requires an ambient mesh with a "
            f"model axis of exactly that size (got {_mesh_model_size()})")
    three_d //= head_shards
    D = three_d // 3
    H = num_heads // head_shards
    d = D // H
    scale = d**-0.5
    use_rope = sin is not None
    use_qk_norm = q_scale is not None
    # bf16 operands ride the MXU directly; fp32 follows the ambient
    # matmul precision like the XLA GEMMs around it: 'float32' -> 6-pass
    # HIGHEST, 'high'/'tensorfloat32' -> manual 3-pass bf16x3 split
    # (hi/lo decomposition dropping the lo*lo term — exactly XLA's
    # 'high'), since Mosaic only lowers DEFAULT/HIGHEST natively.
    if qkv.dtype == jnp.bfloat16:
        dot_mode = "default"
    elif fp32_precision in ("high", "tensorfloat32"):
        dot_mode = "bf16_3x"
    else:
        dot_mode = "highest"

    if use_rope:
        # rotate-half as lane rolls + sign: rot(x) = roll(x, +-d/2) * signs;
        # fold the signs into the sin table and tile tables across heads
        # host-side (tiny, once) so the kernel rotates the WHOLE q/k slab
        # in ~6 vector ops instead of ~6 per head (per-head rope measured
        # 0.7 ms/layer at VTP-L shapes — 16x op-dispatch overhead).
        signs = jnp.concatenate([
            -jnp.ones((d // 2,), jnp.float32), jnp.ones((d // 2,), jnp.float32)
        ])
        sin = (signs[None, :] * sin.astype(jnp.float32)).astype(jnp.bfloat16)
        cos = cos.astype(jnp.bfloat16)
        sin = jnp.tile(sin, (1, H))  # (N, D)
        cos = jnp.tile(cos, (1, H))

    def kernel(*refs):
        if use_rope and use_qk_norm:
            qkv_ref, sin_ref, cos_ref, qs_ref, ks_ref, gm_ref, o_ref = refs
        elif use_rope:
            qkv_ref, sin_ref, cos_ref, o_ref = refs
        elif use_qk_norm:
            qkv_ref, qs_ref, ks_ref, gm_ref, o_ref = refs
        else:
            qkv_ref, o_ref = refs

        def norm_slab(x, w, gm):
            # Whole-slab qk-RMSNorm: every lane needs its head-group's
            # mean of squares, computed as ONE MXU dot with a
            # block-diagonal averaging matrix (entries 1/d — exact in
            # bf16). Alternatives measured at DiT-XL shapes (18 heads,
            # N=256, d=64; PERF.md round 3b): per-head rms/rope loop
            # 842 us/block, lane roll-doubling tree 796 (large-amount
            # rolls are cross-register shuffles), this dot ~430.
            xf = x.astype(jnp.float32)
            xsq = x * x if x.dtype == jnp.bfloat16 else xf * xf
            s = mxu_dot(xsq.astype(gm.dtype), gm, ((1,), (0,)))
            n = xf * jax.lax.rsqrt(s + 1e-5)
            return (n.astype(x.dtype) * w).astype(x.dtype)

        def mxu_dot(a, b, dims):
            if dot_mode == "bf16_3x":
                a_hi = a.astype(jnp.bfloat16)
                a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                b_hi = b.astype(jnp.bfloat16)
                b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                dd = lambda x, y: jax.lax.dot_general(
                    x, y, dimension_numbers=(dims, ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                return dd(a_hi, b_hi) + dd(a_hi, b_lo) + dd(a_lo, b_hi)
            return jax.lax.dot_general(
                a, b, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.DEFAULT if dot_mode == "default"
                           else jax.lax.Precision.HIGHEST),
            )

        def rope_slab(x):
            # The reference rotates in the rope dtype (bf16) regardless of
            # tower precision (attention.py:70-89) — so fp32 inputs are
            # rounded to bf16 first. Mosaic's lane-rotate needs 32-bit
            # data; the rotation runs in fp32 and rounds once (within 1
            # ulp of the reference's three-rounding sequence). Rolling the
            # full (N, H*d) slab crosses head boundaries, so combine a
            # +d/2 and a -d/2 roll with a lane-parity select.
            xf = x.astype(jnp.bfloat16).astype(jnp.float32)
            up = pltpu.roll(xf, d // 2, 1)       # lane i <- i - d/2
            down = pltpu.roll(xf, D - d // 2, 1)  # lane i <- i + d/2 (mod D)
            lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
            rolled = jnp.where(lane % d < d // 2, down, up)
            out = xf * cos_ref[:].astype(jnp.float32) + rolled * sin_ref[:].astype(jnp.float32)
            return out.astype(x.dtype) if x.dtype == jnp.float32 else out.astype(jnp.bfloat16)

        if use_qk_norm:
            q_slab = norm_slab(qkv_ref[0, :, :D], qs_ref[:], gm_ref[:])
            k_slab = norm_slab(qkv_ref[0, :, D:2 * D], ks_ref[:], gm_ref[:])
            if use_rope:
                q_slab = rope_slab(q_slab)
                k_slab = rope_slab(k_slab)
        elif use_rope:
            q_slab = rope_slab(qkv_ref[0, :, :D])
            k_slab = rope_slab(qkv_ref[0, :, D:2 * D])
        else:
            q_slab = k_slab = None

        for h in range(H):
            sl_h = slice(h * d, (h + 1) * d)
            if q_slab is not None:
                q = q_slab[:, sl_h]
                k = k_slab[:, sl_h]
            else:
                q = qkv_ref[0, :, h * d:(h + 1) * d]
                k = qkv_ref[0, :, D + h * d:D + (h + 1) * d]
            v = qkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d]
            scores = mxu_dot(q, k, ((1,), (1,))) * scale
            if n_valid and n_valid != N:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(col < n_valid, scores, -jnp.inf)
            if is_causal:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                scores = jnp.where(col <= row, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            out = mxu_dot(probs, v, ((1,), (0,)))
            o_ref[0, :, h * d:(h + 1) * d] = out.astype(o_ref.dtype)

    qkv_spec = pl.BlockSpec((1, N, three_d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((N, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    # scales are head-tiled to (D,) so norm_slab multiplies whole slabs
    vec_spec = pl.BlockSpec((three_d // 3,), lambda b: (0,), memory_space=pltpu.VMEM)

    inputs = [qkv]
    in_specs = [qkv_spec]
    if use_rope:
        inputs += [sin, cos]
        in_specs += [table_spec, table_spec]
    if use_qk_norm:
        group_mean = jnp.kron(
            jnp.eye(H, dtype=jnp.float32),
            jnp.full((d, d), 1.0 / d, jnp.float32),
        ).astype(qkv.dtype)
        inputs += [jnp.tile(q_scale.astype(jnp.float32), H),
                   jnp.tile(k_scale.astype(jnp.float32), H),
                   group_mean]
        in_specs += [vec_spec, vec_spec,
                     pl.BlockSpec((D, D), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)]

    import os

    def _impl(*arrays):
        # batch size read from the (possibly per-shard) operand: under a
        # multi-device mesh this runs inside shard_map over the data axis
        # and sees B / n_data rows (pallas_call has no SPMD rule).
        Bl = arrays[0].shape[0]
        return pl.pallas_call(
            kernel,
            grid=(Bl,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bl, N, D), qkv.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * Bl * H * N * N * d,
                bytes_accessed=Bl * N * (three_d + D) * qkv.dtype.itemsize,
                transcendentals=Bl * H * N * N,
            ),
            # qk-norm slab arm: headroom above the 16 MB default scoped
            # limit (the gate budgets it, but near the edge Mosaic's own
            # accounting can exceed the default — same as the backward)
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024) if use_qk_norm else None),
            interpret=kernel_dispatch().interpret,
        )(*arrays)

    batched = [True] + [False] * (len(inputs) - 1)  # qkv only
    return _dispatch_sharded(_impl, inputs, batched, out_ranks=[3],
                             head_axis=2 if head_shards > 1 else None)


def _fused_bwd_kernel_call(
    qkv: jax.Array,          # (B, N, 3*H*d) saved forward input
    g: jax.Array,            # (B, N, H*d) output cotangent
    sin, cos,                # (N, d) tables or None
    num_heads: int,
    q_scale=None, k_scale=None,  # optional per-head-dim RMS-norm scales (d,)
    n_valid: int = 0,
    is_causal: bool = False,
    head_shards: int = 1,    # head-major TP layout factor (= model axis)
):
    """Dedicated flash-attention backward: one grid step per batch row
    recomputes the (optionally qk-normed and) roped q/k and the softmax
    from the saved qkv GEMM output (VMEM-resident), then produces
    d(qkv) directly in the packed (B, N, 3D) layout — the backward
    never materializes split q/k/v tensors, mirroring the forward
    kernel's dataflow motivation (relayout cost ~6x the attention math
    at VTP shapes).

    Math per head (standard softmax-attention VJP):
      p  = softmax(q kᵀ·s)        dv = pᵀ g
      dp = g vᵀ                   ds = p ⊙ (dp − rowsum(dp ⊙ p)) · s
      dq̃ = ds k                   dk̃ = dsᵀ q
    then dq/dk = rope-adjoint(dq̃/dk̃): rope(x) = x·cos + roll(x)·sin′
    has adjoint dx = dq̃·cos + roll(dq̃ ⊙ sin′) (the ±d/2 half-roll with
    the lane-parity select is an involution, so the same roll structure
    applies with the sin multiply moved before the roll).

    With qk-norm (the DiT arm, dit/model.py): forward is
    x → n = x·rsqrt(mean_h(x²)+eps) → n·w → rope → attention, where
    mean_h is the per-head-group lane mean (one block-diagonal MXU dot,
    as in the forward kernel). The adjoint chains unrope → scale
    (dn = d(n·w)·w, dw = Σ d(n·w)⊙n) → RMSNorm input rule
    dx = r·dn − x·r³·mean_h(dn⊙x) with r = rsqrt(mean_h(x²)+eps); the
    per-head means again ride the same block-diagonal dot. Returns
    (dqkv, dws) where dws is (B, 8, D) fp32 with per-batch dw_q / dw_k
    row sums in rows 0/1 (folded to (d,) by the caller).

    bf16 only (training compute dtype); fp32 configs use the recompute
    VJP.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # per-SHARD sizes under head-major TP (see _fused_kernel_call)
    B, N, three_d = qkv.shape
    if head_shards > 1 and _mesh_model_size() != head_shards:
        raise ValueError(
            f"head_shards={head_shards} requires an ambient mesh with a "
            f"model axis of exactly that size (got {_mesh_model_size()})")
    three_d //= head_shards
    D = three_d // 3
    H = num_heads // head_shards
    d = D // H
    scale = d**-0.5
    use_rope = sin is not None
    use_qk_norm = q_scale is not None

    if use_rope:
        signs = jnp.concatenate([
            -jnp.ones((d // 2,), jnp.float32), jnp.ones((d // 2,), jnp.float32)
        ])
        sin = (signs[None, :] * sin.astype(jnp.float32)).astype(jnp.bfloat16)
        cos = cos.astype(jnp.bfloat16)
        sin = jnp.tile(sin, (1, H))  # (N, D)
        cos = jnp.tile(cos, (1, H))

    def kernel(*refs):
        if use_rope and use_qk_norm:
            (qkv_ref, g_ref, sin_ref, cos_ref, qs_ref, ks_ref, gm_ref,
             dqkv_ref, dws_ref) = refs
        elif use_rope:
            qkv_ref, g_ref, sin_ref, cos_ref, dqkv_ref = refs
        elif use_qk_norm:
            qkv_ref, g_ref, qs_ref, ks_ref, gm_ref, dqkv_ref, dws_ref = refs
        else:
            qkv_ref, g_ref, dqkv_ref = refs

        def group_mean_dot(x):
            """Per-head-group lane mean of x broadcast back to every
            lane, as one (N, D)x(D, D) block-diagonal MXU dot (fwd
            kernel's norm_slab trick; bf16 operands)."""
            return jax.lax.dot_general(
                x.astype(gm_ref.dtype), gm_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        def lane_roll_half(z):
            """where(lane%d < d/2, roll(z, -d/2), roll(z, +d/2)) — the
            half-roll + parity select shared by rope and its adjoint."""
            up = pltpu.roll(z, d // 2, 1)
            down = pltpu.roll(z, D - d // 2, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            return jnp.where(lane % d < d // 2, down, up)

        def rope_slab(x):
            xf = x.astype(jnp.bfloat16).astype(jnp.float32)
            out = xf * cos_ref[:].astype(jnp.float32) \
                + lane_roll_half(xf) * sin_ref[:].astype(jnp.float32)
            return out.astype(jnp.bfloat16)

        def unrope_slab(dx):
            xf = dx.astype(jnp.float32)
            out = xf * cos_ref[:].astype(jnp.float32) \
                + lane_roll_half(xf * sin_ref[:].astype(jnp.float32))
            return out.astype(dqkv_ref.dtype)

        if use_qk_norm:
            x_q = qkv_ref[0, :, :D]
            x_k = qkv_ref[0, :, D:2 * D]
            # mirror the fwd kernel: bf16 squares into the stats dot.
            # Only r survives the attention loop; n is recomputed from
            # the input ref in the norm-adjoint phase (VMEM liveness).
            r_q = jax.lax.rsqrt(group_mean_dot(x_q * x_q) + 1e-5)
            r_k = jax.lax.rsqrt(group_mean_dot(x_k * x_k) + 1e-5)
            q_slab = ((x_q.astype(jnp.float32) * r_q).astype(x_q.dtype)
                      * qs_ref[:]).astype(x_q.dtype)
            k_slab = ((x_k.astype(jnp.float32) * r_k).astype(x_k.dtype)
                      * ks_ref[:]).astype(x_k.dtype)
            if use_rope:
                q_slab = rope_slab(q_slab)
                k_slab = rope_slab(k_slab)
        elif use_rope:
            q_slab = rope_slab(qkv_ref[0, :, :D])
            k_slab = rope_slab(qkv_ref[0, :, D:2 * D])
        else:
            q_slab = qkv_ref[0, :, :D]
            k_slab = qkv_ref[0, :, D:2 * D]

        dq_parts, dk_parts = [], []
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            q = q_slab[:, sl]
            k = k_slab[:, sl]
            v = qkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d]
            gh = g_ref[0, :, sl]

            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale
            if n_valid and n_valid != N:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -jnp.inf)
            if is_causal:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                s = jnp.where(col <= row, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 (Nq, Nk)
            p_lo = p.astype(v.dtype)

            # dv = pᵀ g  (contract over query rows)
            dv = jax.lax.dot_general(
                p_lo, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            # dp = g vᵀ
            dp = jax.lax.dot_general(
                gh, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(q.dtype)  # (Nq, Nk)

            dq = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dk = jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dq_parts.append(dq.astype(jnp.bfloat16))
            dk_parts.append(dk.astype(jnp.bfloat16))
            # dv retires immediately into the output block (VMEM
            # liveness: no dv parts list carried across the loop)
            dqkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d] = \
                dv.astype(dqkv_ref.dtype)

        if use_qk_norm:
            # One slab fully retired before the other starts (the
            # qk-norm arm's extra fp32 norm intermediates put the
            # naive both-slabs schedule over the VMEM budget at
            # DiT-XL shapes).
            def norm_adjoint(dslab, x, r, w):
                """dslab: cotangent w.r.t. the scaled-normed slab
                (post-unrope). Returns (d_input, dw_row)."""
                dsc = dslab.astype(jnp.float32)
                xf = x.astype(jnp.float32)
                dw = jnp.sum(dsc * (xf * r), axis=0, keepdims=True)
                dn = dsc * w
                t = group_mean_dot(dn * xf)
                return r * dn - xf * (r * r * r) * t, dw

            dq_slab = jnp.concatenate(dq_parts, axis=1)
            if use_rope:
                dq_slab = unrope_slab(dq_slab)
            dq_slab, dwq = norm_adjoint(dq_slab, x_q, r_q, qs_ref[:])
            dqkv_ref[0, :, :D] = dq_slab.astype(dqkv_ref.dtype)
            dk_slab = jnp.concatenate(dk_parts, axis=1)
            if use_rope:
                dk_slab = unrope_slab(dk_slab)
            dk_slab, dwk = norm_adjoint(dk_slab, x_k, r_k, ks_ref[:])
            dqkv_ref[0, :, D:2 * D] = dk_slab.astype(dqkv_ref.dtype)
            dws_ref[0] = jnp.concatenate(
                [dwq, dwk, jnp.zeros((6, D), jnp.float32)], axis=0)
        else:
            dq_slab = jnp.concatenate(dq_parts, axis=1)
            dk_slab = jnp.concatenate(dk_parts, axis=1)
            if use_rope:
                dq_slab = unrope_slab(dq_slab)
                dk_slab = unrope_slab(dk_slab)
            dqkv_ref[0, :, :D] = dq_slab.astype(dqkv_ref.dtype)
            dqkv_ref[0, :, D:2 * D] = dk_slab.astype(dqkv_ref.dtype)

    qkv_spec = pl.BlockSpec((1, N, three_d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((N, D), lambda b: (0, 0), memory_space=pltpu.VMEM)

    inputs = [qkv, g]
    in_specs = [qkv_spec, g_spec]
    if use_rope:
        inputs += [sin, cos]
        in_specs += [table_spec, table_spec]
    if use_qk_norm:
        vec_spec = pl.BlockSpec((D,), lambda b: (0,),
                                memory_space=pltpu.VMEM)
        group_mean = jnp.kron(
            jnp.eye(H, dtype=jnp.float32),
            jnp.full((d, d), 1.0 / d, jnp.float32),
        ).astype(qkv.dtype)
        inputs += [jnp.tile(q_scale.astype(jnp.float32), H),
                   jnp.tile(k_scale.astype(jnp.float32), H),
                   group_mean]
        in_specs += [vec_spec, vec_spec,
                     pl.BlockSpec((D, D), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)]

    import os

    pl_out_specs = qkv_spec
    compiler_params = None
    if use_qk_norm:
        pl_out_specs = [qkv_spec,
                        pl.BlockSpec((1, 8, D), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)]
        # the fp32 norm intermediates push past the default 16 MB
        # scoped-vmem budget at DiT-XL shapes (measured 27.3 MB
        # naive, less after the sequential-slab schedule); v5e has
        # headroom above the default scoped limit
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)

    def _impl(*arrays):
        # per-shard batch under a multi-device mesh (see _impl in
        # _fused_kernel_call); the dws rows stay per-batch here — the
        # caller's .sum(0) over the global (B, 8, D) array is where
        # GSPMD inserts the cross-shard scale-grad reduction.
        Bl = arrays[0].shape[0]
        out_shape = jax.ShapeDtypeStruct((Bl, N, three_d), qkv.dtype)
        if use_qk_norm:
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((Bl, 8, D), jnp.float32)]
        return pl.pallas_call(
            kernel,
            grid=(Bl,),
            in_specs=in_specs,
            out_specs=pl_out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=5 * 2 * Bl * H * N * N * d,
                bytes_accessed=Bl * N * (2 * three_d + D) * qkv.dtype.itemsize,
                transcendentals=Bl * H * N * N,
            ),
            compiler_params=compiler_params,
            interpret=kernel_dispatch().interpret,
        )(*arrays)

    batched = [True, True] + [False] * (len(inputs) - 2)  # qkv, g
    out_ranks = [3, 3] if use_qk_norm else [3]
    return _dispatch_sharded(_impl, inputs, batched, out_ranks=out_ranks,
                             head_axis=2 if head_shards > 1 else None)


def flash_supported_bnhd(q, k, v) -> bool:
    if q.ndim != 4 or q.shape != k.shape or k.shape != v.shape:
        return False
    if q.dtype != jnp.bfloat16:
        return False
    if not _mesh_ok(q.shape[0], heads=q.shape[2]):
        return False
    n, h, d = q.shape[1], q.shape[2], q.shape[3]
    if not (2 <= n <= _MAX_SEQ_FULL and d in (32, 64, 128)):
        return False
    # whole-row blocks must fit VMEM (4 buffers + fp32 scores, x2
    # pipeline); under a model-parallel mesh each shard holds h/model
    # heads (head-sharded dispatch, _dispatch_sharded head_axis)
    h = h // _mesh_model_size()
    vmem_bytes = 4 * n * h * d * 2 * 2 + 2 * n * n * 4
    return vmem_bytes < 12 * 1024 * 1024


def _flash_bnhd_impl(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, d = q.shape
    scale = d**-0.5
    q = q.reshape(B, N, H * d)
    k = k.reshape(B, N, H * d)
    v = v.reshape(B, N, H * d)

    def _impl(qf, kf, vf):
        # per-shard sizes under a multi-device mesh: batch shards over
        # data, heads (contiguous d-wide column chunks) over model
        Bl = qf.shape[0]
        Hl = qf.shape[2] // d

        def kernel(q_ref, k_ref, v_ref, o_ref):
            for h in range(Hl):
                sl = slice(h * d, (h + 1) * d)
                qb = q_ref[0, :, sl]
                kb = k_ref[0, :, sl]
                vb = v_ref[0, :, sl]
                scores = jax.lax.dot_general(
                    qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                ) * scale
                m = jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores - m)
                probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vb.dtype)
                out = jax.lax.dot_general(
                    probs, vb, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                o_ref[0, :, sl] = out.astype(o_ref.dtype)

        spec = pl.BlockSpec((1, N, Hl * d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(Bl,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Bl, N, Hl * d), qf.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * Bl * Hl * N * N * d,
                bytes_accessed=4 * Bl * Hl * N * d * qf.dtype.itemsize,
                transcendentals=Bl * Hl * N * N,
            ),
            interpret=kernel_dispatch().interpret,
        )(qf, kf, vf)

    out = _dispatch_sharded(_impl, (q, k, v), [True, True, True],
                            out_ranks=[3], head_axis=2)
    return out.reshape(B, N, H, d)


def _sdpa_bnhd_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """XLA einsum reference for (B, N, H, d) SDPA — same numerics as the
    kernel (fp32 score/PV accumulation, probs cast to v dtype). Used as
    the recompute backward of :func:`flash_attention_bnhd`."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def flash_attention_bnhd(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Non-causal flash attention over ``(B, N, H, d)`` — the layout the
    qkv projection produces, so no host-side transpose ever
    materializes. Heads live flattened in the feature dim; per-head work
    uses contiguous column slices.

    Performance notes (measured on v5e at VTP-L shapes, B=64 N=257):
      * NO sequence padding: blocks carry the exact (N, H*d) array
        dims (always legal in Mosaic) and softmax runs over exactly N
        columns — padding to the 128-lane multiple costs 4x wall time
        in pad/unpad traffic and wasted tiles (1.66 ms -> 0.42 ms).
      * operands stay bf16 with fp32 MXU accumulation
        (preferred_element_type) — pre-casting to fp32 would select
        multi-pass fp32 matmuls.

    Under a model-parallel mesh, heads shard over ``model`` and the
    kernel runs per-shard over ``H / model`` heads (round-5; the train
    hot path's fused qkv kernel cannot do this — see :func:`_mesh_ok`).
    Differentiable via a recompute VJP (the backward re-runs the XLA
    einsum attention and differentiates that — the pre-round-2 pattern);
    the TRAIN hot path uses the fused kernel's dedicated backward
    kernels instead, so this VJP only serves ad-hoc grads through
    inference entry points."""
    return _flash_bnhd_impl(q, k, v)


def _flash_bnhd_fwd(q, k, v):
    return _flash_bnhd_impl(q, k, v), (q, k, v)


def _flash_bnhd_bwd(res, g):
    # standard SDPA adjoint written out (fp32), rather than a nested
    # jax.vjp of _sdpa_bnhd_xla: under explicit-sharding meshes the
    # cotangent arrives sharding-typed (bf16[B@data,...]) and a nested
    # vjp rejects it; plain einsums let GSPMD shard the math instead
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", probs, g32,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_bnhd.defvjp(_flash_bnhd_fwd, _flash_bnhd_bwd)


@functools.partial(jax.jit, static_argnames=("is_causal",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, is_causal: bool = False) -> jax.Array:
    """Non-causal flash attention over ``(B, H, N, d)``.

    Numerics match torch SDPA / the einsum reference: fp32 QK^T
    accumulation, fp32 softmax, probabilities cast to the value dtype
    for the PV matmul, fp32 PV accumulation, output in q's dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert not is_causal
    B, H, N, d = q.shape
    scale = d**-0.5

    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = max(_round_up(N, _LANE), _LANE)
    pad = n_pad - N
    if pad:
        padding = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)

    kernel = functools.partial(_attn_kernel, n_valid=N, scale=scale)
    spec = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def _impl(qb, kb, vb):
        # per-shard sizes under a multi-device mesh: batch shards over
        # data, heads (dim 1) over model
        Bl, Hl = qb.shape[0], qb.shape[1]
        qf = qb.reshape(Bl * Hl, n_pad, d)
        kf = kb.reshape(Bl * Hl, n_pad, d)
        vf = vb.reshape(Bl * Hl, n_pad, d)
        out = pl.pallas_call(
            kernel,
            grid=(Bl * Hl,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Bl * Hl, n_pad, d), qb.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * (Bl * Hl) * n_pad * n_pad * d,
                bytes_accessed=4 * (Bl * Hl) * n_pad * d * qb.dtype.itemsize,
                transcendentals=(Bl * Hl) * n_pad * n_pad,
            ),
            interpret=kernel_dispatch().interpret,
        )(qf, kf, vf)
        return out.reshape(Bl, Hl, n_pad, d)

    out = _dispatch_sharded(_impl, (q, k, v), [True, True, True],
                            out_ranks=[4], head_axis=1)
    return out[:, :, :N, :] if pad else out
