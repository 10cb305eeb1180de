#!/usr/bin/env python3
"""README quickstart as a runnable script — the reference's smoke test
(README.md:68-134): reconstruction round-trip + zero-shot label probs +
feature extraction on one image.

Usage:
    python examples/quickstart.py --model_path /path/to/VTP-Large-f16d64 \
        [--image figures/dog.png] [--output recon.png]

Without --model_path it runs on a random-init VTP-S (shape smoke test).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--image", default="/root/reference/figures/dog.png")
    p.add_argument("--output", default="reconstruction.png")
    p.add_argument("--labels", nargs="+",
                   default=["a dog", "a cat", "a bird", "a car"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from vtp_tpu import VTPModel, vtp_small
    from vtp_tpu.metrics import psnr
    from vtp_tpu.tokenizers import get_tokenizer
    from vtp_tpu.utils.image import denormalize_nchw, load_image_for_reconstruction

    if args.model_path:
        model = VTPModel.from_torch_checkpoint(args.model_path)
    else:
        print("no --model_path given; using random-init VTP-S")
        model = VTPModel.init(jax.random.key(0), vtp_small())

    x = jnp.asarray(load_image_for_reconstruction(args.image, model.config.image_size))

    # 1. reconstruction round-trip (bf16 encode / fp32 decode)
    latents = model.get_reconstruction_latents(x)
    recon = model.get_latents_decoded_images(latents)
    rec01 = np.clip(np.asarray(denormalize_nchw(recon)), 0, 1)
    orig01 = np.clip(np.asarray(denormalize_nchw(np.asarray(x))), 0, 1)
    val = float(psnr(jnp.asarray(orig01) * 255, jnp.asarray(rec01) * 255)[0])
    Image.fromarray((rec01[0].transpose(1, 2, 0) * 255).astype(np.uint8)).save(args.output)
    print(f"latents: {latents.shape}  reconstruction PSNR: {val:.2f} dB -> {args.output}")

    # 2. zero-shot label probabilities
    tok = get_tokenizer(context_length=model.config.text_context_length)
    texts = jnp.asarray(tok([f"a photo of {l}" for l in args.labels]))
    logits, _ = model.get_clip_logits(x, texts)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    for label, prob in sorted(zip(args.labels, probs), key=lambda t: -t[1]):
        print(f"  {label}: {prob:.4f}")

    # 3. SSL features
    feats = model.get_last_layer_feature(x)
    print(f"cls: {feats['cls_token'].shape}  patch: {feats['patch_tokens'].shape}")


if __name__ == "__main__":
    main()
