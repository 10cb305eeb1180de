"""Triage the VTP-L SSL remote-compile failure (r5 ladder: all legs
HTTP 500 from tpu_compile_helper). Ladder up from known-good:
  1. trivial op (tunnel sanity)
  2. vtp-base SSL step (compiled fine in round 4)
  3. vtp-large CLIP+rec step (compiled fine in round 4, micro 16)
  4. vtp-large SSL step micro 8 (the failing one)
to isolate whether the tunnel is wedged or the VTP-L SSL HLO is the
problem.
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


def step_leg(preset: str, micro: int, ssl: bool, remat) -> None:
    from vtp_tpu.config import PRESETS
    from vtp_tpu.train.step import (
        TrainConfig, build_train_step, init_state, make_ssl_batch,
    )

    cfg = PRESETS[preset]()
    tcfg = TrainConfig(train_ssl=ssl, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=True,
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
    }
    if ssl:
        b["ssl"] = make_ssl_batch(jax.random.key(4), micro,
                                  global_size=cfg.image_size,
                                  patch=cfg.vision_patch_size)
    t0 = time.perf_counter()
    state, m = jax.jit(ts, donate_argnums=(0,))(state, b, jax.random.key(2))
    print(f"  loss {float(m['loss/total']):.4f} in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    del state, ts


def main():
    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    y = float(jnp.sum(x @ x))
    print(f"1. trivial op ok ({y:.0f}) in {time.perf_counter() - t0:.1f}s",
          flush=True)
    legs = [
        ("vtp-base", 8, True, False),
        ("vtp-large", 8, False, "attn"),
        ("vtp-large", 8, True, "attn"),
    ]
    for i, (preset, micro, ssl, remat) in enumerate(legs, start=2):
        print(f"{i}. {preset} micro={micro} ssl={ssl} remat={remat}", flush=True)
        try:
            step_leg(preset, micro, ssl, remat)
        except Exception as e:
            print(f"  FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
