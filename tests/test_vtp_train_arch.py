"""Legacy VTP meta-arch facade smoke tests (vtp.py API parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_train_arch import VTP
from vtp_tpu.train.step import TrainConfig, make_ssl_batch

TINY = VTPConfig(
    image_size=32, vision_patch_size=16, vision_embed_dim=64, vision_depth=2,
    vision_num_heads=2, vision_feature_bottleneck=16, text_context_length=8,
    text_vocab_size=64, text_embed_dim=64, text_num_heads=2, text_depth=2,
    decoder_embed_dim=64, decoder_num_heads=2, decoder_depth=2,
)
TCFG = TrainConfig(dino_out_dim=32, dino_hidden_dim=16, dino_bottleneck_dim=8,
                   total_steps=10)


@pytest.fixture(scope="module")
def arch():
    return VTP(TINY, TCFG, key=jax.random.key(0))


def test_clip_forward(arch, rng):
    img = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    txt = jnp.asarray(rng.integers(1, 60, (3, 8)))
    out = arch(image=img, text=txt, forward_type="clip")
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (3, 64)
    li, lt = arch.get_logits(img, txt)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(li.T, np.float32), np.asarray(lt, np.float32))


def test_rec_forward(arch, rng):
    img = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    out = arch(reconstruction_image=img, forward_type="rec")
    assert out["reconstructed_image"].shape == (2, 3, 32, 32)


def test_ssl_forward_and_teacher_update(arch):
    ssl = make_ssl_batch(jax.random.key(1), 4, global_size=32, local_size=16, n_local=2)
    ssl["n_global_crops"] = 2
    teacher, student = arch(ssl_dict=ssl, forward_type="ssl")
    assert teacher["teacher_cls_tokens_after_head"].shape == (8, 32)
    assert student["student_global_cls_tokens_after_head"].shape == (8, 32)
    assert student["student_local_cls_tokens_after_head"].shape == (8, 32)

    before = np.asarray(arch.teacher["trunk"]["cls_token"])
    # nudge student then EMA-update teacher
    arch.params["trunk"]["cls_token"] = arch.params["trunk"]["cls_token"] + 1.0
    arch.update_teacher(momentum=0.5)
    after = np.asarray(arch.teacher["trunk"]["cls_token"])
    np.testing.assert_allclose(after - before, 0.5, atol=1e-6)
