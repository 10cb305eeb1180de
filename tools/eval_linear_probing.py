#!/usr/bin/env python3
"""Linear probing evaluation CLI.

Equivalent of the reference ``tools/test_linear_probing_hf.py``:
frozen last-4-layer features, 26 heads (2 block-counts x 13 LRs,
avgpool) trained jointly with SGD+cosine for 10x1250 iters at 224px,
best head reported.

Usage:
    python tools/eval_linear_probing.py --model_path /path/to/vtp-l-hf \
        --imagenet_root /path/to/imagenet
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
    p.add_argument("--model_path", required=True)
    p.add_argument("--imagenet_root", required=True, help="dir with train/ and val/")
    p.add_argument("--output_dir", default="./linear_probing_results")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch_length", type=int, default=1250)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--crop_size", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from vtp_tpu.convert.from_torch import load_vtp_checkpoint
    from vtp_tpu.data import DataLoader, ImageFolder, InfiniteSampler
    from vtp_tpu.eval.linear_probe import (
        ProbeConfig,
        build_probe_train_step,
        evaluate_linear_probe,
        init_probe_heads,
        init_probe_state,
    )
    from vtp_tpu.utils.image import IMAGENET_MEAN, IMAGENET_STD, to_nchw_float

    cfg, full_params = load_vtp_checkpoint(args.model_path)
    params = jax.device_put(full_params)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else None

    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)
    rng = np.random.default_rng(0)

    def train_transform(img: Image.Image):
        # RandomResizedCrop(224, bicubic) + flip
        w, h = img.size
        for _ in range(10):
            area = w * h * rng.uniform(0.08, 1.0)
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw, ch = int(round(np.sqrt(area * ar))), int(round(np.sqrt(area / ar)))
            if cw <= w and ch <= h:
                x0 = rng.integers(0, w - cw + 1)
                y0 = rng.integers(0, h - ch + 1)
                img2 = img.crop((x0, y0, x0 + cw, y0 + ch))
                break
        else:
            s = min(w, h)
            img2 = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
        img2 = img2.resize((args.crop_size, args.crop_size), Image.BICUBIC)
        if rng.random() < 0.5:
            img2 = img2.transpose(Image.FLIP_LEFT_RIGHT)
        return (to_nchw_float(img2) - mean) / std

    def eval_transform(img: Image.Image):
        # Resize(256, bicubic) + CenterCrop(224)
        w, h = img.size
        s = 256 / min(w, h)
        img = img.resize((round(w * s), round(h * s)), Image.BICUBIC)
        w, h = img.size
        x0, y0 = (w - args.crop_size) // 2, (h - args.crop_size) // 2
        img = img.crop((x0, y0, x0 + args.crop_size, y0 + args.crop_size))
        return (to_nchw_float(img) - mean) / std

    train_ds = ImageFolder(os.path.join(args.imagenet_root, "train"), transform=train_transform)
    val_ds = ImageFolder(os.path.join(args.imagenet_root, "val"), transform=eval_transform)

    pcfg = ProbeConfig(
        epochs=args.epochs, epoch_length=args.epoch_length, batch_size=args.batch_size,
    )
    heads = init_probe_heads(jax.random.key(0), cfg, pcfg, args.batch_size)
    state = init_probe_state(heads)
    step_fn = build_probe_train_step(params, cfg, pcfg, compute_dtype)

    train_loader = DataLoader(
        train_ds, args.batch_size,
        sampler=InfiniteSampler(len(train_ds)),
        num_workers=args.num_workers, drop_last=True,
    )
    val_loader = DataLoader(val_ds, args.batch_size, num_workers=args.num_workers)

    os.makedirs(args.output_dir, exist_ok=True)
    best_acc, best_key, accs = 0.0, "", {}
    it = iter(train_loader)
    from tqdm import tqdm  # type: ignore

    for epoch in range(args.epochs):
        pbar = tqdm(range(args.epoch_length), desc=f"epoch {epoch}")
        for _ in pbar:
            images, labels = next(it)
            state, loss = step_fn(state, jnp.asarray(images), jnp.asarray(labels))
            pbar.set_postfix(loss=float(loss))
        accs = evaluate_linear_probe(
            params, cfg, state, val_loader, pcfg, compute_dtype, progress=True
        )
        key = max(accs, key=accs.get)
        if accs[key] > best_acc:
            best_acc, best_key = accs[key], key
        print(f"epoch {epoch}: best {accs[key]:.2f}% ({key})")

    results = {"best_accuracy": best_acc, "best_classifier": best_key, "all_accuracies": accs}
    with open(os.path.join(args.output_dir, "linear_probing_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"best_accuracy": best_acc, "best_classifier": best_key}, indent=2))


if __name__ == "__main__":
    main()
