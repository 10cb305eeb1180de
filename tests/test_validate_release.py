"""tools/validate_release.py end-to-end on a tiny synthetic checkpoint
and a 2-class fake ImageNet — verifies the orchestration, metric
plumbing, and tolerance gating (random weights must FAIL the published
numbers)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def release_dir(tmp_path_factory):
    from vtp_tpu.config import VTPConfig
    from vtp_tpu.convert.to_torch import save_hf_checkpoint
    from vtp_tpu.models.vtp_model import init_vtp_params

    root = tmp_path_factory.mktemp("release")
    cfg = VTPConfig(
        image_size=32, vision_patch_size=16, vision_embed_dim=384,
        vision_depth=2, vision_num_heads=2, vision_feature_bottleneck=16,
        text_context_length=16, text_vocab_size=49408, text_embed_dim=64,
        text_num_heads=2, text_depth=2,
        decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
    )
    params = init_vtp_params(jax.random.key(0), cfg)
    ckpt = root / "ckpt"
    save_hf_checkpoint(str(ckpt), params, cfg)

    rng = np.random.default_rng(0)
    for split in ("val",):
        for cls in ("n01440764", "n01443537"):
            d = root / "imagenet" / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return root


@pytest.mark.timeout(600)
def test_validate_release_runs_and_gates(release_dir):
    work = release_dir / "work"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_release.py"),
         "--model_path", str(release_dir / "ckpt"),
         "--imagenet_root", str(release_dir / "imagenet"),
         "--work_dir", str(work),
         "--max_samples", "4", "--batch_size", "2",
         "--skip", "linear_probe"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    out = proc.stdout + proc.stderr
    # random weights: evals must RUN but the gate must FAIL
    assert proc.returncode == 1, out
    with open(work / "validate_release.json") as f:
        results = json.load(f)
    assert results["model"] == "vtp-small"
    assert results["passed"] is False
    # zero-shot actually produced a number and was compared
    assert "zero_shot_top1" in results and "got" in results["zero_shot_top1"], results
    assert "reconstruction_raw" in results
