"""Round 3 (VERDICT #4): quantify the training attention-kernel wall.

The train-step trace shows the fused attention kernels at ~31 TF/s
effective (16% of v5e bf16 peak), 23% of the step. Routes probed here:

  A. shipped forward kernel (rope path) — baseline rate
  B. shipped backward kernel — baseline rate
  C. dots-only forward (no softmax/VPU work) — isolates the MXU rate of
     the per-head (N,N,64) dot chain from VPU/scheduling overhead
  D. dots-only backward pattern (5 dots/head, minimal VPU)
  E. batch-row block-diagonal packing (P=2) of the backward dots:
     (2N, d) operands, (2N, 2N) scores with -inf cross-block masking;
     2x flop waste, pays only if the packed rate is > 2x. Forward-probe
     history: rate 22.7 -> 51.5 TF/s at P=2 but net ~12% and MISCOMPILES
     via scratch (PERF.md round 2b); this variant reads operands via
     jnp.concatenate of direct input slices instead of scratch stores.

All FLOP rates count USEFUL flops only (block-diag waste excluded), so
numbers are directly comparable to the analytic floor.

Run ON TPU: nohup python -u experiments/r3_attn_microbench.py > log &
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, d = 32, 12, 272, 64
D = H * d
ITERS = 30

print(f"device: {jax.devices()[0]}  B={B} H={H} N={N} d={d}", flush=True)

key = jax.random.key(0)
qkv = (jax.random.normal(key, (B, N, 3 * D), jnp.float32) * 0.3).astype(jnp.bfloat16)
g = (jax.random.normal(jax.random.key(1), (B, N, D), jnp.float32) * 0.3).astype(jnp.bfloat16)


def timeit(name, fn, x, flops):
    """Chained timing with terminal host fetch (axon tunnel rules):
    carry threads into the input inside ONE jitted step, a jitted tap
    extracts the next carry, and only the final carry is fetched."""
    def step(x, carry):
        return fn(x + (1e-6 * carry).astype(x.dtype))

    jfn = jax.jit(step)
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    zero = jnp.zeros((), jnp.float32)
    out = jfn(x, zero)
    _ = float(tap(out))  # compile+first
    _ = float(tap(jfn(x, zero)))  # steady state
    t0 = time.perf_counter()
    carry = zero
    for _ in range(ITERS):
        out = jfn(x, carry)
        carry = tap(out)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:38s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TF/s", flush=True)
    return dt


FWD_FLOPS = 2 * 2 * B * H * N * N * d
BWD_FLOPS = 5 * 2 * B * H * N * N * d

# ---- A/B: shipped kernels --------------------------------------------
from vtp_tpu.ops.flash_attention import _fused_bwd_kernel_call, _fused_kernel_call
from vtp_tpu.ops.rope import pad_rope_prefix, rope_sincos

# protocol-shaped rope tables: 1 cls prefix + 16x16 grid, padded to N
periods = jnp.logspace(0, 2, d // 4).astype(jnp.bfloat16)
sin_t, cos_t = rope_sincos(periods, 16, 16)
sin_t, cos_t = pad_rope_prefix(sin_t, cos_t, prefix=1)
pad = N - sin_t.shape[0]
sin_t = jnp.concatenate([sin_t, jnp.zeros((pad, d), sin_t.dtype)])
cos_t = jnp.concatenate([cos_t, jnp.ones((pad, d), cos_t.dtype)])

timeit("A fwd kernel (rope)",
       lambda x: _fused_kernel_call(x, sin_t, cos_t, H, n_valid=257), qkv, FWD_FLOPS)
timeit("B bwd kernel (rope)",
       lambda x: _fused_bwd_kernel_call(x, g, sin_t, cos_t, H, n_valid=257),
       qkv, BWD_FLOPS)

# ---- C: dots-only forward --------------------------------------------

def dots_only_fwd(qkv_ref, o_ref):
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = qkv_ref[0, :, sl]
        k = qkv_ref[0, :, D + h * d:D + (h + 1) * d]
        v = qkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(s.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


qkv_spec = pl.BlockSpec((1, N, 3 * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
o_spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

timeit("C dots-only fwd (2 dots/head)",
       lambda x: pl.pallas_call(
           dots_only_fwd, grid=(B,), in_specs=[qkv_spec], out_specs=o_spec,
           out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
           cost_estimate=pl.CostEstimate(flops=FWD_FLOPS,
                                         bytes_accessed=B * N * 4 * D * 2,
                                         transcendentals=0),
       )(x), qkv, FWD_FLOPS)

# ---- D: dots-only backward pattern -----------------------------------

def dots_only_bwd(qkv_ref, g_ref, o_ref):
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = qkv_ref[0, :, sl]
        k = qkv_ref[0, :, D + h * d:D + (h + 1) * d]
        v = qkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d]
        gh = g_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = s.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(p, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (s * dp).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (dq + dk + dv).astype(o_ref.dtype)


timeit("D dots-only bwd (5 dots/head)",
       lambda x: pl.pallas_call(
           functools.partial(dots_only_bwd), grid=(B,),
           in_specs=[qkv_spec, o_spec], out_specs=o_spec,
           out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
           cost_estimate=pl.CostEstimate(flops=BWD_FLOPS,
                                         bytes_accessed=B * N * 5 * D * 2,
                                         transcendentals=0),
       )(x, g), qkv, BWD_FLOPS)

# ---- E: batch-row packed backward (P=2, concat from input slices) ----

P = 2
M = P * N


def packed_bwd(qkv_ref, g_ref, o_ref):
    # rows of the (P, N, .) block concatenated per head -> (2N, d)
    row = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    same_block = (row // N) == (col // N)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = jnp.concatenate([qkv_ref[j, :, sl] for j in range(P)], axis=0)
        k = jnp.concatenate(
            [qkv_ref[j, :, D + h * d:D + (h + 1) * d] for j in range(P)], axis=0)
        v = jnp.concatenate(
            [qkv_ref[j, :, 2 * D + h * d:2 * D + (h + 1) * d] for j in range(P)],
            axis=0)
        gh = jnp.concatenate([g_ref[j, :, sl] for j in range(P)], axis=0)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(same_block, s, 0.0)
        p = s.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(p, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (s * dp).astype(jnp.bfloat16)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out = (dq + dk + dv).astype(o_ref.dtype)
        for j in range(P):
            o_ref[j, :, sl] = out[j * N:(j + 1) * N, :]


pk_in = pl.BlockSpec((P, N, 3 * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
pk_g = pl.BlockSpec((P, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

packed = lambda x: pl.pallas_call(
    packed_bwd, grid=(B // P,), in_specs=[pk_in, pk_g], out_specs=pk_g,
    out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
    cost_estimate=pl.CostEstimate(flops=P * BWD_FLOPS,
                                  bytes_accessed=B * N * 5 * D * 2,
                                  transcendentals=0),
)(x, g)

# correctness vs D (masked blocks make packed == per-head exactly for
# the dq/dk/dv sums when cross-blocks are zeroed)
ref = jax.jit(lambda x: pl.pallas_call(
    dots_only_bwd, grid=(B,), in_specs=[qkv_spec, o_spec], out_specs=o_spec,
    out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
)(x, g))(qkv)
got = jax.jit(packed)(qkv)
err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
denom = float(jnp.abs(ref.astype(jnp.float32)).max())
print(f"E packed-P2 correctness: max|d|={err:.3g} (ref scale {denom:.3g})",
      flush=True)
if err < 1e-2 * max(denom, 1.0):
    timeit("E packed bwd P=2 (useful flops)", packed, qkv, BWD_FLOPS)
else:
    print("E MISCOMPILES (matches the round-2b Mosaic hazard) — skipping timing")
