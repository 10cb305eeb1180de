"""Gradient-accumulation scaling on v5e (round 3).

Accumulation exists for reference-scale global batches (1024) on small
meshes; this measures its cost: img/s at fixed microbatch 32 as
accum_steps grows. Perfect accumulation is flat img/s (the scan adds
one fp32 grad-buffer add per microbatch, ~HBM-bound over the param
size). DiT-XL is the interesting case — batch 64 direct OOMs the
16 GB chip, but accum reaches effective batch 256+.
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


def bench_vtp(accum, micro=32, iters=6):
    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

    cfg = PRESETS["vtp-base"]()
    tcfg = TrainConfig(train_clip=True, train_ssl=False,
                       train_reconstruction=True, remat=False,
                       unroll_layers=True, accum_steps=accum)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    S, L = cfg.image_size, cfg.text_context_length

    def mk(key):
        k1, k2 = jax.random.split(key)
        b = {"image": jax.random.normal(k1, (micro, 3, S, S)),
             "text": jax.random.randint(k2, (micro, L), 1, 100),
             "rec_image": jax.random.normal(k1, (micro, 3, S, S))}
        if accum > 1:
            b = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (accum, *x.shape)), b)
        return b

    batch = mk(jax.random.key(1))
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.key(2))
    _ = float(m["loss/total"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(3 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    return dt, accum * micro / dt, compile_s


def bench_dit(accum, micro=32, iters=6):
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import (DiTTrainConfig, build_dit_train_step,
                                   init_dit_state)

    cfg = make_dit_config("DiT-XL/1")
    tcfg = DiTTrainConfig(remat="attn", unroll_layers=True,
                          accum_steps=accum)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    shape = ((accum, micro) if accum > 1 else (micro,))
    lat = jax.random.normal(jax.random.key(1),
                            (*shape, cfg.in_channels, cfg.input_size,
                             cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), shape, 0, cfg.num_classes)

    t0 = time.perf_counter()
    state, m = step(state, lat, lab, jax.random.key(3))
    _ = float(m["loss/transport"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, lat, lab, jax.random.key(4 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    return dt, accum * micro / dt, compile_s


def main():
    print("devices:", jax.devices())
    for name, fn, accums in (("VTP-B CLIP+rec", bench_vtp, (1, 2, 4)),
                             ("DiT-XL/1", bench_dit, (1, 4, 8))):
        for a in accums:
            try:
                dt, ips, cs = fn(a)
            except Exception as e:
                print(f"{name} accum={a}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            print(f"{name} accum={a} (eff. batch {a * 32}): "
                  f"{dt * 1e3:.1f} ms/step = {ips:.1f} img/s; "
                  f"compile+first {cs:.1f} s")


if __name__ == "__main__":
    main()
