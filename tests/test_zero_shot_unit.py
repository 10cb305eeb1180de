"""Zero-shot classifier build + native loader coverage (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from vtp_tpu.config import VTPConfig
from vtp_tpu.eval.zero_shot import (
    build_zero_shot_classifier,
    load_imagenet_classnames,
    load_openai_templates,
)
from vtp_tpu.models.vtp_model import init_vtp_params

TINY = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=512, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)


class FakeTokenizer:
    def __call__(self, texts, context_length=8):
        rng = np.random.default_rng(0)
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            h = abs(hash(t)) % 400 + 1
            out[i, 0] = 510 % 512
            out[i, 1] = h
            out[i, 2] = 511 % 512
        return out


def test_shipped_data_assets():
    classes = load_imagenet_classnames()
    templates = load_openai_templates()
    assert len(classes) == 1000 and len(templates) == 80
    assert classes[0] == "tench"
    assert all("{}" in t for t in templates)


def test_build_classifier_tiny(tmp_path, monkeypatch):
    monkeypatch.setenv("VTP_CACHE_DIR", str(tmp_path))
    params = init_vtp_params(jax.random.key(0), TINY)
    classes = ["dog", "cat", "fish", "bird", "ant"]
    templates = ["a photo of a {}.", "an image of a {}."]
    clf = build_zero_shot_classifier(
        params, TINY, FakeTokenizer(), classes, templates,
        num_classes_per_batch=2, compute_dtype=None,
    )
    assert clf.shape == (64, 5)
    norms = np.asarray(jnp.linalg.norm(clf, axis=0))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # token cache written and reused
    import os

    cached = [f for f in os.listdir(tmp_path) if f.startswith("zeroshot_tokens")]
    assert len(cached) == 1
    clf2 = build_zero_shot_classifier(
        params, TINY, FakeTokenizer(), classes, templates,
        num_classes_per_batch=2, compute_dtype=None,
    )
    np.testing.assert_array_equal(np.asarray(clf), np.asarray(clf2))


def test_native_loader(tmp_path):
    from vtp_tpu.native import native_available

    if not native_available():
        pytest.skip("native ingest unavailable")
    from vtp_tpu.data import ImageFolder
    from vtp_tpu.data.native_loader import NativeImageLoader

    rng = np.random.default_rng(0)
    d = tmp_path / "cls_a"
    d.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (70, 90, 3), np.uint8)).save(d / f"{i}.jpg")
    ds = ImageFolder(str(tmp_path))
    loader = NativeImageLoader(ds, batch_size=2, target=32)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 5
    x, y = batches[0]
    assert x.shape == (2, 3, 32, 32) and x.dtype == np.float32
    assert y.shape == (2,)
