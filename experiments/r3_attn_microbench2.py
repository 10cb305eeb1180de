"""Round 3, microbench v2: pin the fwd-kernel fixed overhead.

v1 finding: the shipped forward kernel (2 dots/head + softmax) and the
backward (5 dots/head) take the SAME ~1.6-1.7 ms at B=32 — so the fwd
is NOT dot-bound; something fixed per (batch, head) block dominates.
Probes:
  * batch scaling of the fwd kernel (B=8..64): per-block cost vs fixed
  * s-dot only (1 dot/head): how much of the time is the first dot
  * rows=2 per grid step (halve the grid): grid-step overhead test
  * fp32 score write vs bf16 round-trip: VREG/VMEM traffic of the
    (272, 272) score tile

Run ON TPU: nohup python -u experiments/r3_attn_microbench2.py > log &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, N, d = 12, 272, 64
D = H * d
ITERS = 30

print(f"device: {jax.devices()[0]}  H={H} N={N} d={d}", flush=True)


INNER = 20  # kernel calls chained INSIDE one jit dispatch — tunnel
OUTER = 5   # dispatch latency varies by ms; amortize it away entirely


def timeit(name, fn, x, flops):
    def many(x, carry):
        def body(i, acc):
            out = fn(x + (1e-6 * acc).astype(x.dtype))
            return out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, INNER, body, carry)

    jfn = jax.jit(many)
    zero = jnp.zeros((), jnp.float32)
    _ = float(jfn(x, zero))
    _ = float(jfn(x, zero))
    t0 = time.perf_counter()
    carry = zero
    for _ in range(OUTER):
        carry = jfn(x, carry)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / (OUTER * INNER)
    print(f"{name:44s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.2f} TF/s", flush=True)
    return dt


def qkv_of(B):
    return (jax.random.normal(jax.random.key(0), (B, N, 3 * D), jnp.float32)
            * 0.3).astype(jnp.bfloat16)


def fwd_kernel(n_dots, rows=1, softmax=True):
    def kernel(qkv_ref, o_ref):
        for r in range(rows):
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                q = qkv_ref[r, :, sl]
                k = qkv_ref[r, :, D + h * d:D + (h + 1) * d]
                v = qkv_ref[r, :, 2 * D + h * d:2 * D + (h + 1) * d]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                if softmax:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    pr = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
                else:
                    pr = s.astype(jnp.bfloat16)
                if n_dots >= 2:
                    o = jax.lax.dot_general(pr, v, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    o_ref[r, :, sl] = o.astype(o_ref.dtype)
                else:
                    o_ref[r, :, sl] = pr[:, :d]

    def call(x):
        B = x.shape[0]
        spec = pl.BlockSpec((rows, N, 3 * D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((rows, N, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // rows,), in_specs=[spec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * n_dots * B * H * N * N * d,
                bytes_accessed=B * N * 4 * D * 2,
                transcendentals=B * H * N * N if softmax else 0),
        )(x)

    return call


for B in (8, 16, 32, 64):
    timeit(f"fwd 2dot+softmax B={B}", fwd_kernel(2), qkv_of(B),
           2 * 2 * B * H * N * N * d)

timeit("fwd 1dot nosoftmax B=32", fwd_kernel(1, softmax=False), qkv_of(32),
       2 * 1 * 32 * H * N * N * d)
timeit("fwd 2dot nosoftmax B=32", fwd_kernel(2, softmax=False), qkv_of(32),
       2 * 2 * 32 * H * N * N * d)
timeit("fwd 2dot+softmax rows=2 B=32", fwd_kernel(2, rows=2), qkv_of(32),
       2 * 2 * 32 * H * N * N * d)
timeit("fwd 2dot+softmax rows=4 B=32", fwd_kernel(2, rows=4), qkv_of(32),
       2 * 2 * 32 * H * N * N * d)

# shipped kernels under the robust harness (v1 numbers were dispatch-noisy)
from vtp_tpu.ops.flash_attention import _fused_bwd_kernel_call, _fused_kernel_call
from vtp_tpu.ops.rope import pad_rope_prefix, rope_sincos

periods = jnp.logspace(0, 2, d // 4).astype(jnp.bfloat16)
sin_t, cos_t = rope_sincos(periods, 16, 16)
sin_t, cos_t = pad_rope_prefix(sin_t, cos_t, prefix=1)
pad = N - sin_t.shape[0]
sin_t = jnp.concatenate([sin_t, jnp.zeros((pad, d), sin_t.dtype)])
cos_t = jnp.concatenate([cos_t, jnp.ones((pad, d), cos_t.dtype)])

g32 = (jax.random.normal(jax.random.key(1), (32, N, D), jnp.float32) * 0.3
       ).astype(jnp.bfloat16)
timeit("SHIPPED fwd kernel (rope) B=32",
       lambda x: _fused_kernel_call(x, sin_t, cos_t, H, n_valid=257),
       qkv_of(32), 2 * 2 * 32 * H * N * N * d)
timeit("SHIPPED bwd kernel (rope) B=32",
       lambda x: _fused_bwd_kernel_call(x, g32, sin_t, cos_t, H, n_valid=257),
       qkv_of(32), 5 * 2 * 32 * H * N * N * d)
