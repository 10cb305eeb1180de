"""Device-time per fused-kernel arm at DiT-XL shapes (trace-based).

Wall-clock per-call timing through the tunnel is noise (r3b_qknorm_slab_time2
printed 30 ms for the simplest arm); this chains 30 calls per arm in one
jit, traces, and reads the custom-call device time from the xplane.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.ops.flash_attention import _fused_kernel_call

B, N, H, d = 32, 256, 18, 64
ITERS = 30
TRACE = "/tmp/qknorm_arm_trace"


def run_arm(tag, call, qkv):
    def chained(x):
        def body(carry, _):
            o = call(carry)
            carry = carry.at[:, :, : H * d].set(o.astype(carry.dtype))
            return carry, ()
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    f = jax.jit(chained)
    y = f(qkv)
    _ = float(y.ravel()[0].astype(jnp.float32))
    tdir = f"{TRACE}_{tag.replace(' ', '_')}"
    with jax.profiler.trace(tdir):
        y = f(qkv * jnp.bfloat16(1.001))
        _ = float(y.ravel()[0].astype(jnp.float32))

    from vtp_tpu.utils.xplane import exclusive_op_summary, parse_xspace

    pb = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))[-1]
    planes = parse_xspace(open(pb, "rb").read())
    rows = exclusive_op_summary(planes)
    kern = [r for r in rows if "closed_call" in r["name"] or
            ("custom-call" in r["name"] and "bf16[32,256,1152]" in r["name"].split("=")[1][:40])]
    t = sum(r["total_ms"] for r in kern) / ITERS
    print(f"{tag}: {t*1e3:.1f} us/call device time")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

    run_arm("bare", lambda x: _fused_kernel_call(x, None, None, H), qkv)
    run_arm("rope", lambda x: _fused_kernel_call(x, sin_t, cos_t, H), qkv)
    run_arm("norm", lambda x: _fused_kernel_call(x, None, None, H,
                                                 q_scale=qs, k_scale=ks), qkv)
    run_arm("norm_rope", lambda x: _fused_kernel_call(x, sin_t, cos_t, H,
                                                      q_scale=qs, k_scale=ks), qkv)


if __name__ == "__main__":
    main()
