#!/usr/bin/env python3
"""Compute FID between two image sources (folders or ADM-format .npz).

Equivalent of the reference's rank-0 FID passes
(tools/test_reconstruction_hf.py:98-176 over PNG folders;
generation/tools/inference_lightningdit_vtp.py:143-160 vs
VIRTUAL_imagenet256_labeled.npz), but streaming: activations reduce to
running moments on device, nothing is ever fully materialized.

Requires Inception weights (VTP_INCEPTION_WEIGHTS).

Usage:
    python tools/compute_fid.py --path1 ./rec_out/ref --path2 ./rec_out/rec
    python tools/compute_fid.py --path1 VIRTUAL_imagenet256_labeled.npz \
        --path2 ./dit_samples
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import bootstrap

bootstrap()


def iter_batches(path: str, batch_size: int, image_size: int):
    import numpy as np

    if path.endswith(".npz"):
        data = np.load(path)
        arr = data[data.files[0]]  # (N, H, W, 3) uint8
        for s in range(0, len(arr), batch_size):
            x = arr[s : s + batch_size].astype(np.float32) / 255.0
            yield x.transpose(0, 3, 1, 2)
        return

    from PIL import Image

    from vtp_tpu.data import ImageFolder

    def transform(img):
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), Image.BILINEAR)
        return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

    ds = ImageFolder(path, transform=transform)
    from vtp_tpu.data import DataLoader

    for x, _ in DataLoader(ds, batch_size, num_workers=8):
        yield x


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--path1", required=True)
    p.add_argument("--path2", required=True)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--image_size", type=int, default=299)
    args = p.parse_args()

    from vtp_tpu.metrics import FrechetStats, fid_from_stats
    from vtp_tpu.metrics.inception import load_inception_feature_fn

    feature_fn = load_inception_feature_fn()

    stats = []
    for path in (args.path1, args.path2):
        st = FrechetStats(2048)
        n = 0
        for batch in iter_batches(path, args.batch_size, args.image_size):
            st.update(feature_fn(batch))
            n += batch.shape[0]
            if n % 1000 < args.batch_size:
                print(f"{path}: {n} images", flush=True)
        print(f"{path}: {n} images total")
        stats.append(st)

    fid = fid_from_stats(stats[0], stats[1])
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
