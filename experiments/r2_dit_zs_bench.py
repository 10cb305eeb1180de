"""TPU measurements: DiT-XL/1 train-step throughput + zero-shot
classifier build time with/without the causal flash kernel (VTP-L text
tower, 1000 classes x 80 templates = 80k texts)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.models.vtp_model import init_vtp_params
from vtp_tpu.utils import cast_matmul_params


def bench_classifier(tag, params, cfg):
    from vtp_tpu.eval.zero_shot import build_zero_shot_classifier
    from vtp_tpu.tokenizers.bpe import get_tokenizer

    tok = get_tokenizer()
    t0 = time.perf_counter()
    clf = build_zero_shot_classifier(params, cfg, tok)
    clf.block_until_ready()
    _ = float(clf.ravel()[0])  # host fetch = real sync through the tunnel
    dt = time.perf_counter() - t0
    print(f"[zs-build {tag}] {dt:.1f}s total (incl tokenize+compile), "
          f"classifier {clf.shape}", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- zero-shot classifier build: flash vs no-flash ---
    cfg = PRESETS["vtp-large"]()
    params = init_vtp_params(jax.random.key(0), cfg)
    params["text"] = cast_matmul_params(params["text"], jnp.bfloat16)
    params = jax.device_put(params)

    os.environ["VTP_DISABLE_FLASH"] = "1"
    t_noflash = bench_classifier("xla", params, cfg)
    os.environ.pop("VTP_DISABLE_FLASH")
    # fresh jit cache: build_zero_shot_classifier re-jits per call anyway
    t_flash = bench_classifier("flash-causal", params, cfg)
    print(f"[zs-build] speedup {t_noflash / t_flash:.2f}x", flush=True)

    # --- DiT-XL/1 step time ---
    os.environ["BENCH_MODE"] = "dit"
    import bench

    bench.bench_dit()
    print("JOB-DONE", flush=True)


if __name__ == "__main__":
    main()
