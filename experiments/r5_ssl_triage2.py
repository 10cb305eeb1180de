"""Bisect the VTP-L SSL remote-compile failure (triage 1: vtp-base SSL
and vtp-large CLIP+rec compile fine; vtp-large SSL HTTP-500s in the
compile helper). Suspects: (a) HLO size — unroll_layers at depth 24 x
the SSL step's ~4 tower invocations; (b) a kernel shape only VTP-L SSL
hits. Legs flip one ingredient each.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax
import jax.numpy as jnp

from vtp_tpu.ops.dispatch import kernel_overrides


def leg(*, micro=8, remat="attn", unroll: bool, iters=2, **overrides) -> None:
    import gc

    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
    )

    cfg = PRESETS["vtp-large"]()
    tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll,
                       moment_dtype="bf16")
    state = init_state(jax.random.key(0), cfg, tcfg)
    ts = build_train_step(cfg, tcfg)
    k1, k2 = jax.random.split(jax.random.key(1))
    b = {
        "image": jax.random.normal(k1, (micro, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (micro, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(
            k1, (micro, 3, cfg.image_size, cfg.image_size)),
        "ssl": make_ssl_batch(jax.random.key(4), micro,
                              global_size=cfg.image_size,
                              patch=cfg.vision_patch_size),
    }
    with kernel_overrides(**overrides):
        step = jax.jit(ts, donate_argnums=(0,))
        t0 = time.perf_counter()
        state, m = step(state, b, jax.random.key(2))
        print(f"  loss {float(m['loss/total']):.4f} compile+first "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        for i in range(iters):
            t0 = time.perf_counter()
            state, m = step(state, b, jax.random.key(3 + i))
            _ = float(m["loss/total"])
            print(f"  iter {i + 1}: {time.perf_counter() - t0:.2f}s "
                  f"({micro / (time.perf_counter() - t0):.1f} img/s micro)",
                  flush=True)
    del state, ts
    gc.collect()


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    legs = [
        dict(unroll=False),                          # scan: small HLO
        dict(unroll=True, disable_fused_ce=True),    # CE kernel out
        dict(unroll=True, disable_flash=True, disable_fused_ce=True,
             disable_bwd_kernel=True),               # all kernels out
    ]
    for i, g in enumerate(legs, start=1):
        print(f"{i}. vtp-large ssl micro=8 remat=attn {g}", flush=True)
        try:
            leg(**g)
        except Exception as e:
            print(f"  FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
