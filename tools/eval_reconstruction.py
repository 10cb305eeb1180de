#!/usr/bin/env python3
"""ImageNet reconstruction evaluation CLI (PSNR/SSIM/LPIPS + rFID).

Equivalent of the reference ``tools/test_reconstruction_hf.py``: ADM
center-crop + ImageNet normalize, bf16 encode / fp32 decode, per-batch
metrics, ref/rec PNG dumps, rFID over the folders (or streaming from
in-memory Inception activations when weights are available).

Usage:
    python tools/eval_reconstruction.py --model_path /path/to/vtp-l-hf \
        --imagenet_val /path/to/imagenet/val --save_dir ./rec_out \
        [--max_samples 50000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--imagenet_val", required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--save_dir", default=None, help="dump ref/rec PNGs here")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vtp_tpu.convert.from_torch import load_vtp_checkpoint
    from vtp_tpu.data import DataLoader, ImageFolder
    from vtp_tpu.eval.reconstruction import evaluate_reconstruction
    from vtp_tpu.metrics.lpips import LPIPS
    from vtp_tpu.utils.image import (
        IMAGENET_MEAN, IMAGENET_STD, center_crop_arr, to_nchw_float,
    )

    cfg, params = load_vtp_checkpoint(args.model_path)
    params = jax.device_put(params)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else None

    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)

    def transform(img):
        x = to_nchw_float(center_crop_arr(img, args.image_size))
        return (x - mean) / std

    dataset = ImageFolder(args.imagenet_val, transform=transform)
    sampler = range(min(len(dataset), args.max_samples or len(dataset)))
    loader = DataLoader(
        dataset, args.batch_size, sampler=sampler,
        num_workers=args.num_workers, drop_last=False,
    )

    lpips_metric = LPIPS()
    if not lpips_metric.available:
        print("Warning: LPIPS weights not found (set VTP_LPIPS_WEIGHTS); "
              "LPIPS will not be calculated")

    inception_fn = None
    try:
        from vtp_tpu.metrics.inception import load_inception_feature_fn

        inception_fn = load_inception_feature_fn()
    except Exception as e:  # weights absent -> same degradation as reference
        print(f"Warning: Inception weights unavailable ({e}); rFID will "
              "not be calculated")

    # resume-by-skipping (reference test_reconstruction_hf.py:293-325):
    # if the output folders already hold every sample, skip regeneration
    # and compute rFID straight from the saved PNGs.
    expected = min(len(dataset), args.max_samples or len(dataset))
    if args.save_dir:
        from vtp_tpu.eval.reconstruction import count_images, fid_from_folders

        ref_dir = os.path.join(args.save_dir, "ref")
        rec_dir = os.path.join(args.save_dir, "rec")
        if count_images(ref_dir) >= expected and count_images(rec_dir) >= expected:
            print(f"outputs already complete ({expected} images); skipping "
                  "regeneration, computing rFID from folders")
            results = {"num_samples": expected, "rfid": None}
            if inception_fn is not None:
                results["rfid"] = fid_from_folders(ref_dir, rec_dir, inception_fn)
            print(json.dumps(results, indent=2))
            if args.output:
                with open(args.output, "w") as f:
                    json.dump(results, f, indent=2)
            return

    results = evaluate_reconstruction(
        params, cfg, loader,
        compute_dtype=compute_dtype,
        save_dir=args.save_dir,
        max_samples=args.max_samples,
        lpips_metric=lpips_metric,
        inception_feature_fn=inception_fn,
        progress=True,
    )
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
