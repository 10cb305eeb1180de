#!/usr/bin/env python3
"""ImageNet zero-shot evaluation CLI.

Equivalent of the reference ``tools/test_zero_shot_hf.py`` (same
protocol: naive (S,S) resize + ImageNet normalize, 80-template
classifier, 100x cosine logits, top-1/5). Single process; the global
batch shards across all local TPU devices via NamedSharding.

Usage:
    python tools/eval_zero_shot.py --model_path /path/to/vtp-l-hf \
        --imagenet_val /path/to/imagenet/val [--batch_size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--imagenet_val", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--output", default=None, help="optional JSON results path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vtp_tpu.convert.from_torch import load_vtp_checkpoint
    from vtp_tpu.data import DataLoader, ImageFolder
    from vtp_tpu.eval.zero_shot import build_zero_shot_classifier, evaluate_zero_shot
    from vtp_tpu.parallel import batch_sharding, make_mesh
    from vtp_tpu.tokenizers import get_tokenizer
    from vtp_tpu.utils.image import IMAGENET_MEAN, IMAGENET_STD, resize_naive, to_nchw_float
    import numpy as _np

    cfg, params = load_vtp_checkpoint(args.model_path)
    params = jax.device_put(params)
    tokenizer = get_tokenizer(context_length=cfg.text_context_length)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else None

    mean = _np.asarray(IMAGENET_MEAN, _np.float32).reshape(3, 1, 1)
    std = _np.asarray(IMAGENET_STD, _np.float32).reshape(3, 1, 1)

    def transform(img):
        x = to_nchw_float(resize_naive(img, args.image_size))
        return (x - mean) / std

    dataset = ImageFolder(args.imagenet_val, transform=transform)
    sampler = range(min(len(dataset), args.max_samples or len(dataset)))
    loader = DataLoader(
        dataset, args.batch_size, sampler=sampler,
        num_workers=args.num_workers, drop_last=False,
    )

    print("Building zero-shot classifier (1000 classes x 80 templates)...")
    classifier = build_zero_shot_classifier(
        params, cfg, tokenizer, compute_dtype=compute_dtype, progress=True
    )

    mesh = make_mesh() if jax.device_count() > 1 else None
    sharding = batch_sharding(mesh) if mesh else None
    top1, top5 = evaluate_zero_shot(
        params, cfg, classifier, loader,
        compute_dtype=compute_dtype, sharding=sharding, progress=True,
    )
    print(f"Top-1: {top1:.2f}%  Top-5: {top5:.2f}%")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"top1": top1, "top5": top5}, f, indent=2)


if __name__ == "__main__":
    main()
