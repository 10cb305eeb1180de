#!/usr/bin/env python3
"""Train a latent DiT on extracted VTP latents.

TPU-native replacement for the reference's LightningDiT train wrapper
(generation/tools/train_lightningdit_vtp.py): instead of shelling into
an external torch trainer, the DiT runs natively (vtp_tpu.dit) with the
same recipe: DiT-XL/1 on f16d64 latents, AdamW 2e-4 beta2 0.95, global
batch 1024, velocity/Linear transport + cosine loss + lognorm time
sampling, EMA, latents normalized by extracted stats. Data shards over
the device mesh.

Usage:
    python tools/train_dit.py --latent_dir ./latents_out/latents/vtp-l/... \
        --preset DiT-XL/1 --batch_size 1024 --steps 100000 --out ./dit_ckpt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--latent_dir", required=True)
    p.add_argument("--preset", default="DiT-XL/1")
    p.add_argument("--in_channels", type=int, default=64)
    p.add_argument("--input_size", type=int, default=16)
    p.add_argument("--depth", type=int, default=None,
                   help="override the preset's depth (debug/tiny runs)")
    p.add_argument("--dim", type=int, default=None,
                   help="override the preset's width (debug/tiny runs)")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: split the global batch "
                        "into this many microbatches per optimizer step")
    p.add_argument("--accum_dtype", default="fp32", choices=["fp32", "bf16"],
                   help="accumulator dtype; bf16 fits DiT-XL/1 "
                        "accumulation on one 16 GB chip (fp32 does not)")
    p.add_argument("--moment_dtype", default="fp32", choices=["fp32", "bf16"],
                   help="Adam moment storage; bf16 halves optimizer HBM "
                        "traffic and frees one fp32 param copy of state "
                        "(sub-percent update noise — train/optim.py)")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lognorm_mu", type=float, default=-0.75)
    p.add_argument("--lognorm_sigma", type=float, default=1.0)
    p.add_argument("--ckpt_every", type=int, default=20_000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--out", default="./dit_ckpt")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--remat", default="attn",
                   choices=["off", "full", "dots", "attn", "dots_attn"],
                   help="gradient-checkpoint policy; 'attn' + unroll is the "
                        "fastest XL/1 config that fits v5e (PERF.md)")
    p.add_argument("--no_unroll_layers", action="store_true",
                   help="use lax.scan for the depth loop instead of the "
                        "(default) unrolled backward")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtp_tpu.checkpoint import (
        latest_train_state_step,
        restore_train_state,
        save_train_state,
        wait_for_checkpoints,
    )
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import (
        DiTTrainConfig,
        LatentShardDataset,
        build_dit_train_step,
        init_dit_state,
    )
    from vtp_tpu.parallel import make_mesh

    overrides = {k: v for k, v in
                 (("depth", args.depth), ("dim", args.dim)) if v}
    cfg = make_dit_config(args.preset, in_channels=args.in_channels,
                          input_size=args.input_size, **overrides)
    tcfg = DiTTrainConfig(
        learning_rate=args.lr, total_steps=args.steps,
        lognorm_mu=args.lognorm_mu, lognorm_sigma=args.lognorm_sigma,
        remat=(False if args.remat == "off"
               else True if args.remat == "full" else args.remat),
        unroll_layers=not args.no_unroll_layers,
        accum_steps=args.accum_steps,
        accum_dtype=args.accum_dtype,
        moment_dtype=args.moment_dtype,
    )
    if args.batch_size % args.accum_steps:
        raise SystemExit("batch_size must divide by accum_steps")
    # accumulation is host-driven (two small jits, Python microbatch
    # loop): the in-jit scan variant plans ~24 MB over v5e HBM at
    # DiT-XL/1 (vtp_tpu/dit/train.build_dit_microbatch_steps)
    host_accum = args.accum_steps > 1

    state = init_dit_state(jax.random.key(args.seed), cfg, tcfg)
    start_step = 0
    if args.resume and latest_train_state_step(args.out) is not None:
        state = restore_train_state(args.out, state)
        start_step = int(state["step"])
        print(f"resumed from step {start_step}")

    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    if host_accum:
        from vtp_tpu.dit.train import build_dit_microbatch_steps

        micro_raw, apply_raw = build_dit_microbatch_steps(cfg, tcfg)
        micro_fn = jax.jit(micro_raw, donate_argnums=(1, 2))
        apply_fn = jax.jit(apply_raw, donate_argnums=(0, 1, 2))
    else:
        step_fn = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))

    ds = LatentShardDataset(args.latent_dir, latent_norm=True, seed=args.seed)
    batches = ds.batches(args.batch_size)

    t0 = time.time()
    accum = args.accum_steps
    for step in range(start_step, args.steps):
        z, y = next(batches)
        if accum > 1:  # leading (accum,) microbatch axis
            z = np.asarray(z).reshape(accum, -1, *np.shape(z)[1:])
            y = np.asarray(y).reshape(accum, -1)
        z, y = jnp.asarray(z), jnp.asarray(y)
        if mesh is not None:
            lead = (None,) if accum > 1 else ()
            z = jax.device_put(z, NamedSharding(
                mesh, P(*lead, "data", None, None, None)))
            y = jax.device_put(y, NamedSharding(mesh, P(*lead, "data")))
        key = jax.random.fold_in(jax.random.key(args.seed), step)
        if host_accum:
            from vtp_tpu.dit.train import run_accum_step

            state, metrics = run_accum_step(
                micro_fn, apply_fn, tcfg, state, z, y, key)
        else:
            state, metrics = step_fn(state, z, y, key)
        if (step + 1) % args.log_every == 0:
            rate = args.log_every * args.batch_size / (time.time() - t0)
            print(f"step {step + 1}: loss {float(metrics['loss/transport']):.4f} "
                  f"(mse {float(metrics['loss/mse']):.4f}) {rate:.0f} img/s")
            t0 = time.time()
        if (step + 1) % args.ckpt_every == 0 or step + 1 == args.steps:
            save_train_state(args.out, jax.device_get(state), block=False)
            print(f"saved checkpoint at step {step + 1}")

    wait_for_checkpoints()


if __name__ == "__main__":
    main()
