"""DiT-XL/1 class-conditional sampling throughput on v5e (round 3).

The generation headline of the reference is gFID-50k, whose inference
cost is 50,000 samples x 250 euler steps through DiT-XL
(generation/tools/inference_lightningdit_vtp.py). This measures that
path: samples/s per chip for the no-cfg protocol (cfg=1.0, the
published no-guidance numbers) and the cfg>1 variant (2 forwards/step),
plus the implied wall-clock for a full 50k-sample gFID run.

Tunnel rules honored: every sampler call takes a distinct PRNG key
(defeats the dispatch dedup cache) and timing ends with a host fetch.
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

from vtp_tpu.dit.model import init_dit_params, make_dit_config
from vtp_tpu.dit.sample import make_sampler
from vtp_tpu.utils.params import cast_matmul_params


def bench_sampler(cfg, params, batch, *, cfg_scale=1.0, num_steps=250,
                  iters=3, warmup=1):
    sampler = make_sampler(cfg, num_steps=num_steps, cfg_scale=cfg_scale)
    labels = jnp.asarray(np.arange(batch) % cfg.num_classes)
    key = jax.random.key(0)

    t0 = time.perf_counter()
    out = sampler(params, key, labels)
    _ = float(out.ravel()[0].astype(jnp.float32))
    compile_s = time.perf_counter() - t0

    for i in range(warmup):
        out = sampler(params, jax.random.fold_in(key, 100 + i), labels)
    _ = float(out.ravel()[0].astype(jnp.float32))

    t0 = time.perf_counter()
    for i in range(iters):
        out = sampler(params, jax.random.fold_in(key, i + 1), labels)
    _ = float(out.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main():
    print("devices:", jax.devices())
    cfg = make_dit_config("DiT-XL/1")
    params = init_dit_params(jax.random.key(0), cfg)
    params = cast_matmul_params(params, jnp.bfloat16)
    params = jax.device_put(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"DiT-XL/1 params: {n_params/1e6:.1f}M, latents "
          f"({cfg.in_channels},{cfg.input_size},{cfg.input_size})")

    # rough flops: per forward ~2 * 2 * N_linear_params * tokens... use
    # XLA cost analysis on the jitted sampler instead (exact).
    for batch in (32, 64, 128):
        for cfg_scale in (1.0, 1.5):
            tag = f"B={batch} cfg={cfg_scale}"
            try:
                dt, compile_s = bench_sampler(cfg, params, batch,
                                              cfg_scale=cfg_scale)
            except Exception as e:  # OOM guard
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            sps = batch / dt
            wall_50k_min = 50000 / sps / 60
            print(f"{tag}: {dt*1e3:.1f} ms/batch = {sps:.1f} samples/s "
                  f"(250 steps); 50k-gFID wall {wall_50k_min:.1f} min/chip; "
                  f"compile+first {compile_s:.1f} s")


if __name__ == "__main__":
    main()
