"""Round 3: does a plain XLA int8xint8->int32 dot hit the v5e int8 MXU
rate (~394 TOPS, 2x bf16)? Decides whether the quantized encode path
can be pure XLA or needs a Pallas kernel.

Harness notes (each version of this file fixed a real measurement bug;
keep all three rules):
  - chain iterations through a data dependency + host fetch — the axon
    tunnel dedup-caches identical dispatches and block_until_ready is a
    no-op (CLAUDE.md);
  - warm with the SAME static iters (a changed static arg recompiles
    inside the timed region);
  - the feedback must CONSUME THE WHOLE PRODUCT: feeding back c[0,0]
    alone lets XLA slice-through-dot simplify the GEMM to a vector dot
    (measured an impossible "1600 TF/s"). A full jnp.sum(c) costs one
    ~78 us HBM pass per iter — same overhead for every dtype.

Run ON TPU: nohup python -u experiments/r3_int8_microbench.py > log &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax
import jax.numpy as jnp
from functools import partial

print(f"device: {jax.devices()[0]}", flush=True)

M = N = K = 4096
ITERS = 256


@partial(jax.jit, static_argnames=("iters", "out_dtype"))
def chain(a, b, iters, out_dtype):
    def body(i, carry):
        a_, acc = carry
        c = jax.lax.dot_general(
            a_, b, (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )
        s = jnp.sum(c.astype(jnp.float32))
        fb = (s * 1e-9).astype(a_.dtype) if a_.dtype != jnp.int8 \
            else (s.astype(jnp.int32) % 63).astype(jnp.int8)
        return a_.at[0, 0].set(fb), acc + s

    a, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
    return acc


def bench(tag, dtype, out_dtype):
    k = jax.random.key(0)
    if dtype == jnp.int8:
        a = jax.random.randint(k, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(k, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(k, (M, K), dtype)
        b = jax.random.normal(k, (K, N), dtype)
    _ = float(chain(a, b, ITERS, out_dtype))
    for rep in range(2):
        a = a + jnp.ones((), a.dtype) * (rep + 1)
        t0 = time.perf_counter()
        _ = float(chain(a, b, ITERS, out_dtype))
        dt = time.perf_counter() - t0
        tops = 2 * M * N * K * ITERS / dt / 1e12
        print(f"{tag:24s} rep{rep} {dt*1e3/ITERS:7.3f} ms/gemm+sum  {tops:7.1f} T{'OPS' if dtype==jnp.int8 else 'FLOPS'}",
              flush=True)


bench("bf16 x bf16 -> f32", jnp.bfloat16, jnp.float32)
bench("int8 x int8 -> int32", jnp.int8, jnp.int32)
