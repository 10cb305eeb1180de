#!/usr/bin/env python3
"""Bulk f16d64 latent extraction for DiT training.

Equivalent of ``generation/tools/extract_features_vtp.py``: encodes the
dataset twice (unflipped + flipped), writes safetensors shards of
10,000 images holding {latents, latents_flip, labels}, then computes
per-channel latent stats.

TPU-native: one process; each global batch shards over the device mesh;
shard writes happen on host while the next batch encodes (the loader
prefetches). Multi-host runs pass --shard/--num_shards per host.

Usage:
    python tools/extract_latents.py --model_path /path/to/vtp-l-hf \
        --data_path /path/to/imagenet/train --output_dir ./latents_out
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
    p.add_argument("--model_path", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--normalize_type", default="imagenet", choices=["imagenet", "half"])
    p.add_argument("--shard", type=int, default=0, help="host shard index")
    p.add_argument("--num_shards", type=int, default=1, help="number of hosts")
    p.add_argument("--shard_size", type=int, default=10000)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 encoder (utils/quantization): ~2x MXU "
                        "dot rate on v5e; latent quality shifts slightly "
                        "(see PERF.md round 3)")
    args = p.parse_args()

    import numpy as np

    from vtp_tpu.data import DataLoader, ImageFolder, ShardedSampler
    from vtp_tpu.generation import VTPTokenizer, compute_latent_stats
    from vtp_tpu.generation.latents import save_latent_shard

    import jax

    from vtp_tpu.parallel import batch_sharding, make_mesh

    sharding = None
    if jax.device_count() > 1:
        sharding = batch_sharding(make_mesh())
        print(f"sharding batches over {jax.device_count()} devices")
    tokenizer = VTPTokenizer.from_checkpoint(
        args.model_path, img_size=args.image_size, normalize_type=args.normalize_type,
        data_sharding=sharding, quantize_int8=args.int8,
    )
    model_name = os.path.basename(args.model_path.rstrip("/"))
    output_dir = os.path.join(
        args.output_dir, "latents", model_name,
        f"imgnet{args.image_size}_norm{args.normalize_type}",
    )
    os.makedirs(output_dir, exist_ok=True)
    print(f"Output directory: {output_dir}")

    datasets = [
        ImageFolder(args.data_path, transform=tokenizer.img_transform(p_hflip=p))
        for p in (0.0, 1.0)
    ]
    n = len(datasets[0])
    if args.max_samples:
        n = min(n, args.max_samples)
    sampler = ShardedSampler(n, args.shard, args.num_shards).indices()
    loaders = [
        DataLoader(ds, args.batch_size, sampler=sampler,
                   num_workers=args.num_workers) for ds in datasets
    ]
    print(f"Total data: {len(datasets[0])}, this shard: {len(sampler)}")

    latents, latents_flip, labels = [], [], []
    saved = 0
    done = 0
    t0 = time.time()
    for (x0, y0), (x1, _) in zip(*loaders):
        latents.append(tokenizer.encode_images(x0))
        latents_flip.append(tokenizer.encode_images(x1))
        labels.append(np.asarray(y0))
        done += x0.shape[0]
        if done % (args.batch_size * 10) < args.batch_size:
            rate = done / (time.time() - t0)
            print(f"{done}/{len(sampler)} images ({rate:.1f} img/s incl. flip)")
        if sum(z.shape[0] for z in latents) >= args.shard_size:
            save_latent_shard(
                output_dir, args.shard, saved,
                np.concatenate(latents), np.concatenate(latents_flip),
                np.concatenate(labels),
            )
            print(f"Saved shard {saved}")
            latents, latents_flip, labels = [], [], []
            saved += 1
    if latents:
        save_latent_shard(
            output_dir, args.shard, saved,
            np.concatenate(latents), np.concatenate(latents_flip),
            np.concatenate(labels),
        )
        print(f"Saved shard {saved}")

    if args.shard == 0:
        mean, std = compute_latent_stats(output_dir)
        print(f"Latent stats saved to {output_dir} "
              f"(mean range [{mean.min():.3f}, {mean.max():.3f}])")


if __name__ == "__main__":
    main()
