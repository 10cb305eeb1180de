"""Checkpoint IO and generation-pipeline tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.checkpoint import (
    flatten_params,
    load_pretrained,
    save_pretrained,
    unflatten_params,
)
from vtp_tpu.config import VTPConfig
from vtp_tpu.generation.latents import (
    compute_latent_stats,
    load_latent_stats,
    save_latent_shard,
)
from vtp_tpu.models.vtp_model import VTPModel, init_vtp_params

TINY = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=64, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


def test_flatten_roundtrip():
    params = init_vtp_params(jax.random.key(0), TINY)
    flat = flatten_params(params)
    back = unflatten_params(flat)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )
    # None leaves (bias=None) survive
    assert back["visual_proj"]["bias"] is None


def test_save_load_pretrained(tmp_path):
    params = init_vtp_params(jax.random.key(0), TINY)
    save_pretrained(str(tmp_path / "ckpt"), TINY, params)
    cfg2, params2 = load_pretrained(str(tmp_path / "ckpt"))
    assert cfg2 == TINY
    x = jax.random.normal(jax.random.key(1), (1, 3, 32, 32))
    m1 = VTPModel(TINY, params, encode_dtype=None)
    m2 = VTPModel(cfg2, params2, encode_dtype=None)
    np.testing.assert_array_equal(
        np.asarray(m1.get_reconstruction_latents(x)),
        np.asarray(m2.get_reconstruction_latents(x)),
    )
    # rope periods keep their bf16 dtype through the roundtrip
    assert params2["trunk"]["rope"]["periods"].dtype == jnp.bfloat16


def test_train_state_orbax_roundtrip(tmp_path):
    from vtp_tpu.checkpoint import restore_train_state, save_train_state
    from vtp_tpu.train.step import TrainConfig, init_state

    tcfg = TrainConfig(dino_out_dim=32, dino_hidden_dim=16, dino_bottleneck_dim=8,
                       total_steps=10)
    state = init_state(jax.random.key(0), TINY, tcfg)
    save_train_state(str(tmp_path / "train"), state, step=0)
    restored = restore_train_state(str(tmp_path / "train"), state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["trunk"]["cls_token"]),
        np.asarray(state["params"]["trunk"]["cls_token"]),
    )


def test_train_state_async_save(tmp_path):
    """block=False saves overlap the write; wait_for_checkpoints makes
    them durable and a restore reads the LAST of several async saves."""
    from vtp_tpu.checkpoint import (
        latest_train_state_step,
        restore_train_state,
        save_train_state,
        wait_for_checkpoints,
    )
    from vtp_tpu.train.step import TrainConfig, init_state

    tcfg = TrainConfig(dino_out_dim=32, dino_hidden_dim=16,
                       dino_bottleneck_dim=8, total_steps=10)
    state = init_state(jax.random.key(0), TINY, tcfg)
    out = str(tmp_path / "train_async")
    for step in (1, 2):
        state["step"] = jnp.asarray(step)
        save_train_state(out, state, step=step, block=False)
    wait_for_checkpoints()
    assert latest_train_state_step(out) == 2
    restored = restore_train_state(out, state)
    assert int(restored["step"]) == 2
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["trunk"]["cls_token"]),
        np.asarray(state["params"]["trunk"]["cls_token"]),
    )


def test_latent_shards_and_stats(tmp_path, rng):
    d = str(tmp_path / "latents")
    all_lat = []
    for shard in range(3):
        lat = rng.normal(1.5, 2.0, (20, 16, 2, 2)).astype(np.float32)
        flip = rng.normal(1.5, 2.0, (20, 16, 2, 2)).astype(np.float32)
        labels = rng.integers(0, 10, 20)
        save_latent_shard(d, 0, shard, lat, flip, labels)
        all_lat += [lat, flip]
    mean, std = compute_latent_stats(d)
    assert mean.shape == std.shape == (1, 16, 1, 1)
    cat = np.concatenate(all_lat, axis=0).transpose(1, 0, 2, 3).reshape(16, -1)
    np.testing.assert_allclose(mean[0, :, 0, 0], cat.mean(-1), rtol=1e-5)
    np.testing.assert_allclose(std[0, :, 0, 0], cat.std(-1), rtol=1e-4)
    # reload path (+ torch .pt interop file)
    m2, s2 = load_latent_stats(d)
    np.testing.assert_array_equal(m2, mean)
    assert os.path.exists(os.path.join(d, "latents_stats.pt"))


def test_vtp_tokenizer_adapter(rng):
    from vtp_tpu.generation import VTPTokenizer

    params = init_vtp_params(jax.random.key(0), TINY)
    tok = VTPTokenizer(TINY, params, img_size=32)
    assert tok.latent_size == 2 and tok.embed_dim == 16

    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (48, 40, 3), np.uint8))
    x = tok.img_transform()(img)
    assert x.shape == (3, 32, 32)
    xf = tok.img_transform(p_hflip=1.0)(img)
    np.testing.assert_allclose(x[:, :, ::-1], xf, atol=1e-6)

    z = tok.encode_images(x[None])
    assert z.shape == (1, 16, 2, 2) and z.dtype == np.float32
    out = tok.decode_to_images(z)
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8


def test_tokenizer_sharded_encode(rng):
    """VTPTokenizer with a data-sharded batch matches unsharded."""
    from vtp_tpu.generation import VTPTokenizer
    from vtp_tpu.parallel import batch_sharding, make_mesh

    params = init_vtp_params(jax.random.key(0), TINY)
    mesh = make_mesh(8, 1)
    tok_s = VTPTokenizer(TINY, params, img_size=32,
                         data_sharding=batch_sharding(mesh))
    tok_p = VTPTokenizer(TINY, params, img_size=32)
    x = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
    np.testing.assert_allclose(tok_s.encode_images(x), tok_p.encode_images(x), atol=1e-5)


def test_format_routing_both_ways(tmp_path, rng):
    """from_torch_checkpoint on a NATIVE dir routes to the native loader
    (and load_pretrained on an HF dir routes to the converter)."""
    params = init_vtp_params(jax.random.key(0), TINY)
    save_pretrained(str(tmp_path / "native"), TINY, params)

    from vtp_tpu.convert.from_torch import load_vtp_checkpoint

    cfg2, params2 = load_vtp_checkpoint(str(tmp_path / "native"))
    assert cfg2 == TINY
    x = jax.random.normal(jax.random.key(1), (1, 3, 32, 32))
    np.testing.assert_array_equal(
        np.asarray(VTPModel(TINY, params, encode_dtype=None).get_reconstruction_latents(x)),
        np.asarray(VTPModel(cfg2, params2, encode_dtype=None).get_reconstruction_latents(x)),
    )

    # HF-format dir through load_pretrained (reverse routing)
    from vtp_tpu.checkpoint import load_pretrained
    from vtp_tpu.convert.to_torch import save_hf_checkpoint

    save_hf_checkpoint(str(tmp_path / "hf"), params, TINY)
    cfg3, params3 = load_pretrained(str(tmp_path / "hf"))
    np.testing.assert_allclose(
        np.asarray(VTPModel(cfg3, params3, encode_dtype=None).get_reconstruction_latents(x)),
        np.asarray(VTPModel(TINY, params, encode_dtype=None).get_reconstruction_latents(x)),
        atol=1e-5,
    )


def test_sample_dit_cli_end_to_end(tmp_path):
    """tools/train_dit.py -> tools/sample_dit.py produce the gFID input
    artifact: per-sample PNGs plus an ADM-format samples.npz (arr_0,
    uint8 NHWC) — the exact layout the ADM FID suite consumes
    (reference: generation/tools/inference_lightningdit_vtp.py's
    save protocol). Tiny DiT-B/1 + TINY VTP decoder on CPU."""
    import subprocess
    import sys

    rng = np.random.default_rng(0)
    lat_dir = tmp_path / "latents"
    lat_dir.mkdir()
    lat = rng.normal(size=(64, 16, 2, 2)).astype(np.float32)
    save_latent_shard(str(lat_dir), 0, 0, lat, lat[:, :, :, ::-1].copy(),
                      rng.integers(0, 10, 64))
    compute_latent_stats(str(lat_dir), save=True)

    params = init_vtp_params(jax.random.key(0), TINY)
    save_pretrained(str(tmp_path / "vtp"), TINY, params)

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/train_dit.py", "--latent_dir", str(lat_dir),
         "--preset", "DiT-B/1", "--depth", "2", "--dim", "192",
         "--in_channels", "16", "--input_size", "2",
         "--batch_size", "8", "--steps", "1", "--log_every", "1",
         "--out", str(tmp_path / "dit_ckpt"), "--remat", "off"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "samples"
    r = subprocess.run(
        [sys.executable, "tools/sample_dit.py",
         "--dit_ckpt", str(tmp_path / "dit_ckpt"),
         "--model_path", str(tmp_path / "vtp"),
         "--latent_dir", str(lat_dir),
         "--preset", "DiT-B/1", "--depth", "2", "--dim", "192",
         "--in_channels", "16", "--input_size", "2",
         "--num_samples", "6", "--batch_size", "4", "--num_steps", "4",
         "--out", str(out), "--save_npz"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    pngs = sorted(p.name for p in out.glob("sample_*.png"))
    assert pngs == [f"sample_{i:06d}.png" for i in range(6)]
    with np.load(out / "samples.npz") as z:
        arr = z["arr_0"]
    assert arr.shape == (6, 32, 32, 3)
    assert arr.dtype == np.uint8
    assert arr.std() > 0  # decoded content, not zeros
