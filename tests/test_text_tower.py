"""Parity tests for the full standalone TextTransformer surface:
embed_cls forward path, output_tokens, prune_intermediate_layers, and
mask_k_bias from-scratch semantics — against the live PyTorch reference
(vtp/models/encoders/text_transformer.py:231-452)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

load_reference()

import torch  # noqa: E402
from vtp.models.encoders.text_transformer import TextTransformer as RefText  # noqa: E402

from vtp_tpu.convert.from_torch import convert_text  # noqa: E402
from vtp_tpu.config import VTPConfig  # noqa: E402
from vtp_tpu.models.text_encoder import (  # noqa: E402
    TextConfig,
    init_text_params,
    prune_intermediate_layers,
    text_encode,
    text_forward_intermediates,
)

DIMS = dict(context_length=12, vocab_size=128, width=32, heads=2, layers=3)


def _pair(*, embed_cls=False, output_tokens=False, pool_type="argmax", output_dim=16):
    torch.manual_seed(0)
    ref = RefText(
        output_dim=output_dim, embed_cls=embed_cls, pool_type=pool_type,
        output_tokens=output_tokens, **DIMS,
    ).eval()
    cfg = TextConfig(
        output_dim=output_dim, embed_cls=embed_cls, pool_type=pool_type,
        output_tokens=output_tokens, **DIMS,
    )
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    vcfg = VTPConfig(text_depth=DIMS["layers"])
    params = convert_text(sd, vcfg)
    return ref, cfg, params


def _text(rng, pad_tail=True):
    text = rng.integers(1, 120, (4, DIMS["context_length"]))
    text[:, -1] = 127  # EOT (argmax pool target)
    if pad_tail:
        text[0, 7:] = 0  # padded sequence exercises the cls mask
        text[2, 9:] = 0
    return text


def test_embed_cls_forward(rng):
    ref, cfg, params = _pair(embed_cls=True, pool_type="last")
    text = _text(rng)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(text))
    ours = text_encode(params, cfg, text=jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=5e-5, rtol=1e-4)


def test_output_tokens(rng):
    ref, cfg, params = _pair(embed_cls=True, pool_type="last", output_tokens=True)
    text = _text(rng)
    with torch.no_grad():
        ref_pooled, ref_tokens = ref(torch.from_numpy(text))
    pooled, tokens = text_encode(params, cfg, text=jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(), atol=5e-5, rtol=1e-4)


def test_output_tokens_no_cls(rng):
    ref, cfg, params = _pair(output_tokens=True)
    text = _text(rng, pad_tail=False)
    with torch.no_grad():
        ref_pooled, ref_tokens = ref(torch.from_numpy(text))
    pooled, tokens = text_encode(params, cfg, text=jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(), atol=5e-5, rtol=1e-4)


def test_embed_cls_intermediates(rng):
    ref, cfg, params = _pair(embed_cls=True, pool_type="last")
    text = _text(rng)
    with torch.no_grad():
        ref_out = ref.forward_intermediates(
            torch.from_numpy(text), indices=2, output_fmt="NLC",
            output_extra_tokens=True,
        )
    ours = text_forward_intermediates(
        params, cfg, jnp.asarray(text), indices=2, output_extra_tokens=True,
    )
    assert len(ours["text_intermediates"]) == len(ref_out["text_intermediates"]) == 2
    for j, t in zip(ours["text_intermediates"], ref_out["text_intermediates"]):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=5e-5, rtol=1e-4)
    for j, t in zip(
        ours["text_intermediates_suffix"], ref_out["text_intermediates_suffix"]
    ):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["text_features"]), ref_out["text_features"].numpy(),
        atol=5e-5, rtol=1e-4,
    )


def test_prune_intermediate_layers(rng):
    ref, cfg, params = _pair()
    text = _text(rng, pad_tail=False)
    ref_take = ref.prune_intermediate_layers(indices=2, prune_head=True)
    pruned, pcfg, take = prune_intermediate_layers(params, cfg, indices=2)
    assert take == ref_take
    assert pcfg.layers == len(ref.transformer.resblocks)
    assert "text_projection" not in pruned
    with torch.no_grad():
        ref_out = ref.forward_intermediates(
            torch.from_numpy(text), indices=2, output_fmt="NLC",
            intermediates_only=True,
        )
    ours = text_forward_intermediates(
        pruned, pcfg, jnp.asarray(text), indices=take, intermediates_only=True,
    )
    for j, t in zip(ours["text_intermediates"], ref_out["text_intermediates"]):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=5e-5, rtol=1e-4)


def test_mask_k_bias_from_scratch():
    """vision_mask_k_bias=True must zero the K third of the qkv bias in
    the forward AND its gradient (LinearKMaskedBias, attention.py:26-38)."""
    from vtp_tpu.models.vit import ViTConfig, init_vit_params, vit_forward_features

    cfg = ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8, mask_k_bias=True)
    params = init_vit_params(jax.random.key(0), cfg)
    d = cfg.embed_dim
    # poison the K-bias third: the forward must be invariant to it
    poisoned = jax.tree.map(lambda a: a, params)
    poisoned["blocks"]["attn"]["qkv"]["bias"] = (
        params["blocks"]["attn"]["qkv"]["bias"].at[:, d:2 * d].set(123.0)
    )
    img = jax.random.normal(jax.random.key(1), (1, 3, 16, 16))
    out_a = vit_forward_features(params, cfg, img)
    out_b = vit_forward_features(poisoned, cfg, img)
    np.testing.assert_allclose(
        np.asarray(out_a["x_norm_clstoken"]), np.asarray(out_b["x_norm_clstoken"])
    )

    def loss(p):
        return vit_forward_features(p, cfg, img)["x_norm_clstoken"].sum()

    g = jax.grad(loss)(params)
    kgrad = g["blocks"]["attn"]["qkv"]["bias"][:, d:2 * d]
    qgrad = g["blocks"]["attn"]["qkv"]["bias"][:, :d]
    assert float(jnp.abs(kgrad).max()) == 0.0
    assert float(jnp.abs(qgrad).max()) > 0.0


def test_update_center_masks_padding():
    """Padded iBOT buffer rows must not bias the center EMA."""
    from vtp_tpu.train.losses import update_center

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    w = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    center = jnp.zeros((4,))
    got = update_center(center, logits, 0.9, weight=w)
    want = 0.1 * np.asarray(logits)[:3].mean(0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_text_encode_unroll_matches_scan(rng):
    """unroll=True (train-perf path, PERF.md round 3) must match the
    scan path to XLA refusion noise in forward and backward."""
    _, cfg, params = _pair(embed_cls=True)
    text = jnp.asarray(_text(rng))
    a = text_encode(params, cfg, text)
    b = text_encode(params, cfg, text, unroll=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    def loss(p, unroll):
        return (text_encode(p, cfg, text, unroll=unroll) ** 2).sum()

    g_scan = jax.grad(loss)(params, False)
    g_unroll = jax.grad(loss)(params, True)
    for ga, gb in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_unroll)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=1e-4)
