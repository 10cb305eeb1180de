"""On-chip parity + speed probe for the whole-slab qk-norm kernel path.

The per-head qk-norm/rope loop cost 842 us/block at DiT-XL shapes
(18 heads, N=256, d=64) — see traces/r3b_dit_sample. This checks the
roll-tree slab rewrite on real Mosaic (interpret mode already passes;
CLAUDE.md lists two kernels that passed interpret and miscompiled
on-chip) and times it with in-jit chaining + host fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.ops.flash_attention import (
    _fused_kernel_call,
    _fused_reference_impl,
)

B, N, H, d = 32, 256, 18, 64
ITERS = 50


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

    # ---- parity on-chip
    got = jax.jit(lambda x: _fused_kernel_call(x, sin_t, cos_t, H,
                                               q_scale=qs, k_scale=ks))(qkv)
    want = jax.jit(lambda x: _fused_reference_impl(x, sin_t, cos_t, qs, ks, H))(qkv)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    err = np.abs(g - w).max()
    rel = err / max(np.abs(w).max(), 1e-9)
    print(f"parity qk-norm+rope: max abs {err:.3e} rel {rel:.3e} "
          f"(signal max {np.abs(w).max():.3f})")
    assert rel < 3e-2, "on-chip parity failure"

    # also the no-rope qk-norm arm
    got2 = jax.jit(lambda x: _fused_kernel_call(x, None, None, H,
                                                q_scale=qs, k_scale=ks))(qkv)
    want2 = jax.jit(lambda x: _fused_reference_impl(x, None, None, qs, ks, H))(qkv)
    rel2 = (np.abs(np.asarray(got2, np.float32) - np.asarray(want2, np.float32)).max()
            / max(np.abs(np.asarray(want2, np.float32)).max(), 1e-9))
    print(f"parity qk-norm no-rope: rel {rel2:.3e}")
    assert rel2 < 3e-2

    # ---- timing: chain iterations through a data dependency
    def chained(x):
        def body(carry, _):
            o = _fused_kernel_call(carry, sin_t, cos_t, H, q_scale=qs, k_scale=ks)
            # keep shape (B,N,3D): write attention output into q slot
            carry = carry.at[:, :, : H * d].set(o.astype(carry.dtype))
            return carry, ()
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    f = jax.jit(chained)
    y = f(qkv)
    _ = float(y.ravel()[0].astype(jnp.float32))  # compile + first
    t0 = time.perf_counter()
    y = f(qkv * jnp.bfloat16(1.001))
    _ = float(y.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"qk-norm+rope kernel: {dt*1e6:.1f} us/call at (B={B},N={N},H={H},d={d}) "
          f"[was 842 us/block per-head path]")


if __name__ == "__main__":
    main()
