"""Isolate the slab qk-norm slowdown: time each kernel arm in the same
chained-scan harness (no-norm fast path vs qk-norm variants)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.ops.flash_attention import _fused_kernel_call

B, N, H, d = 32, 256, 18, 64
ITERS = 30


def time_arm(tag, call):
    def chained(x):
        def body(carry, _):
            o = call(carry)
            carry = carry.at[:, :, : H * d].set(o.astype(carry.dtype))
            return carry, ()
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    f = jax.jit(chained)
    y = f(qkv)
    _ = float(y.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    y = f(qkv * jnp.bfloat16(1.001))
    _ = float(y.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt*1e6:.1f} us/call")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

    time_arm("no-norm no-rope", lambda x: _fused_kernel_call(x, None, None, H))
    time_arm("rope only (fast path)",
             lambda x: _fused_kernel_call(x, sin_t, cos_t, H))
    time_arm("qk-norm only (slab tree)",
             lambda x: _fused_kernel_call(x, None, None, H, q_scale=qs, k_scale=ks))
    time_arm("qk-norm + rope",
             lambda x: _fused_kernel_call(x, sin_t, cos_t, H, q_scale=qs, k_scale=ks))


if __name__ == "__main__":
    main()
