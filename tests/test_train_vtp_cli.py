"""End-to-end pre-training loop (tools/train_vtp.py) + multi-crop data
pipeline (data/ssl_crops.py): crops have the right shapes/stats, the
mask bookkeeping matches the static-upperbound layout the jitted step
consumes, and a tiny run on a real ImageFolder trains, checkpoints,
resumes, and exports an HF-loadable dir."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vtp_tpu.data import (
    ImageFolder,
    MultiCropDataset,
    MultiCropTransform,
    collate_multicrop,
    make_mask_bookkeeping,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls in ("cat", "dog"):
        d = root / cls
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 255, (80, 96, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_multicrop_shapes_and_determinism(image_dir):
    folder = ImageFolder(image_dir)
    t = MultiCropTransform(global_size=32, local_size=16, n_local=3)
    ds = MultiCropDataset(folder, t, seed=7)
    g, l, label = ds[0]
    assert g.shape == (2, 3, 32, 32) and g.dtype == np.float32
    assert l.shape == (3, 3, 16, 16)
    assert label == 0
    # same (seed, epoch, idx) -> same crops
    ds2 = MultiCropDataset(ImageFolder(image_dir), t, seed=7)
    g2, _, _ = ds2[0]
    np.testing.assert_array_equal(g, g2)
    # normalized stats are sane (not raw [0,255])
    assert abs(float(g.mean())) < 3.0


def test_collate_layout(image_dir):
    folder = ImageFolder(image_dir)
    t = MultiCropTransform(global_size=32, local_size=16, n_local=2)
    ds = MultiCropDataset(folder, t)
    items = [ds[i] for i in range(3)]
    g, l, labels = collate_multicrop(items)
    assert g.shape == (6, 3, 32, 32)  # [crop0 x3 | crop1 x3]
    assert l.shape == (6, 3, 16, 16)  # [loc0 x3 | loc1 x3]
    assert labels.shape == (3,)
    # crop0 of item 1 lands at row 1, crop1 of item 1 at row 3+1
    np.testing.assert_array_equal(g[1], items[1][0][0])
    np.testing.assert_array_equal(g[4], items[1][0][1])


def test_mask_bookkeeping_layout():
    rng = np.random.default_rng(0)
    bk = make_mask_bookkeeping(rng, n_imgs=4, n_patches=16, mask_ratio=0.25,
                               upperbound_ratio=0.5)
    n_tokens, upper = 64, 32
    assert bk["masks"].shape == (4, 16)
    assert bk["mask_indices"].shape == (upper,)
    assert bk["mask_weight"].shape == (upper,)
    n_masked = int(n_tokens * 0.25)
    assert bk["mask_weight"].sum() == n_masked
    assert bk["masks"].sum() == n_masked
    live = bk["mask_indices"][:n_masked]
    assert len(set(live.tolist())) == n_masked
    flat = bk["masks"].reshape(-1)
    assert flat[live].all()


def test_train_vtp_cli_end_to_end(image_dir, tmp_path):
    """One tiny 2-step run: trains (clip+ssl+rec), checkpoints, exports
    HF, and a --resume invocation restores the saved step. Kept to a
    single jit compile — the step compile dominates CPU runtime."""
    import train_vtp

    out = str(tmp_path / "ckpt")
    argv = [
        "--data_dir", image_dir, "--out", out,
        # clip+rec only: the ssl-objective-under-mesh compile is covered
        # by test_train_step_sharded_dp_tp; the 8-way pure-DP CPU mesh
        # also starves XLA's collective rendezvous on a 1-core box, so
        # use the same proven 4x2 shape that test uses
        "--objectives", "clip,rec", "--mesh", "4,2",
        "--batch_size", "8", "--steps", "2", "--local_crops", "2",
        "--local_size", "16", "--num_workers", "2",
        "--ckpt_every", "2", "--log_every", "1",
        "--compute_dtype", "fp32", "--no_remat", "--export_hf",
        "--allow_pseudo_captions",  # vocab 128 < real BPE ids (debug config)
        "--config", _tiny_config_json(tmp_path),
    ]
    train_vtp.main(argv)
    # checkpoint written
    from vtp_tpu.checkpoint import latest_train_state_step
    assert latest_train_state_step(out) == 2
    # HF export loads back
    from vtp_tpu.checkpoint import load_pretrained
    cfg, params = load_pretrained(os.path.join(out, "hf_export"))
    assert cfg.vision_embed_dim == 64
    assert "trunk" in params and "dino_head" not in params
    # resume restores step 2 (steps=2 -> nothing left to train; the
    # restore path runs without touching the jit cache)
    train_vtp.main(argv + ["--resume"])
    assert latest_train_state_step(out) == 2
    # resuming with a DIFFERENT qkv layout must be refused: the
    # head-major permutation is shape/dtype-identical to canonical, so
    # only the train_meta.json sidecar can catch it (silent Q/K/V
    # column misinterpretation otherwise)
    with pytest.raises(SystemExit, match="layout mismatch"):
        train_vtp.main(argv + ["--resume", "--tp_head_major"])


def _tiny_config_json(tmp_path) -> str:
    # vocab 128: the big CLIP vocab dominates tiny-config compile time;
    # --allow_pseudo_captions opts into pseudo-captions for this case
    cfg = dict(
        image_size=32, vision_patch_size=16, vision_embed_dim=64,
        vision_depth=2, vision_num_heads=2, vision_feature_bottleneck=16,
        text_context_length=8, text_vocab_size=128, text_embed_dim=64,
        text_num_heads=2, text_depth=2,
        decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
    )
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_train_vtp_cli_context_parallel(image_dir, tmp_path, kernels):
    """--context_parallel N builds a (data, seq) mesh and the step's
    attention rides the ring: one tiny step must run and checkpoint.
    force_token_pad pads N=5 -> 8 so the token dim divides seq=4
    (on TPU the alignment padding is automatic)."""
    kernels(force_token_pad=True)
    import train_vtp

    out = str(tmp_path / "ckpt_cp")
    train_vtp.main([
        "--data_dir", image_dir, "--out", out,
        "--objectives", "clip,rec", "--context_parallel", "4",
        "--batch_size", "8", "--steps", "1", "--local_crops", "2",
        "--local_size", "16", "--num_workers", "2",
        "--ckpt_every", "1", "--log_every", "1",
        "--compute_dtype", "fp32", "--no_remat",
        "--allow_pseudo_captions",
        "--config", _tiny_config_json(tmp_path),
    ])
    from vtp_tpu.checkpoint import latest_train_state_step
    assert latest_train_state_step(out) == 1
