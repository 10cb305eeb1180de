"""Trace the DiT-XL/1 TRAIN step on v5e (round 3b).

The fused attention kernel's custom VJP only has a dedicated Pallas
backward for the no-qk-norm bf16 arm (flash_attention.py:158-176);
DiT trains with qk-norm (DiTConfig.use_qk_norm=True), so its backward
falls to the pure-JAX reference VJP — XLA's qkv-split/relayout
dataflow plus a full forward recompute of the norm/rope/attention
chain. This traces one train step (remat='attn', unroll — the round-2b
operating point, 94.3 img/s) and prints the exclusive per-op
breakdown to size that fallback before building the qk-norm backward
kernel arm.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.dit.model import init_dit_params, make_dit_config
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

BATCH = 32
STEPS = 5
TRACE_DIR = "/root/repo/traces/r3b_dit_train"


def main():
    print("devices:", jax.devices())
    cfg = make_dit_config("DiT-XL/1")
    tcfg = DiTTrainConfig(remat="attn", unroll_layers=True)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))

    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, cfg.in_channels, cfg.input_size, cfg.input_size)
    ).astype(np.float32))
    labels = jnp.asarray(np.arange(BATCH) % cfg.num_classes)

    state, m = step(state, lat, labels, jax.random.key(1))
    print("compiled; loss", float(m["loss/transport"]), "gnorm", float(m["grad_norm"]))

    with jax.profiler.trace(TRACE_DIR):
        for i in range(STEPS):
            state, m = step(state, lat, labels, jax.random.key(2 + i))
        _ = float(m["loss/transport"])
    print("trace written")

    import glob

    from vtp_tpu.utils.xplane import exclusive_op_summary, parse_xspace

    pb = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))[-1]
    planes = parse_xspace(open(pb, "rb").read())
    rows = exclusive_op_summary(planes)
    total = sum(r["total_ms"] for r in rows)
    print(f"\ntotal exclusive: {total:.1f} ms / {STEPS} steps = "
          f"{total/STEPS:.2f} ms/step ({BATCH*STEPS/ (total/1e3):.1f} img/s device)")
    print("\ntop ops (ms per step):")
    for r in rows[:50]:
        print(f"{r['total_ms']/STEPS:8.3f} x{r['count']//STEPS:<4} "
              f"{r['mean_us']:7.1f}us  {r['name'][:120]}")


if __name__ == "__main__":
    main()
