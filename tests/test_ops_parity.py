"""Numerical parity of primitive ops against the PyTorch reference
(vtp/models/layers/*), run live on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

load_reference()  # puts /root/reference on sys.path, stubs omegaconf/torchvision

import torch  # noqa: E402

from vtp.models.layers.attention import SelfAttention  # noqa: E402
from vtp.models.layers.embeddings import PatchEmbed, RopePositionEmbedding  # noqa: E402
from vtp.models.layers.ffn import SwiGLUFFN, Mlp  # noqa: E402
from vtp.models.layers.normalization import RMSNorm, LayerNorm  # noqa: E402

from vtp_tpu.ops import (  # noqa: E402
    apply_rope_with_prefix,
    layer_norm,
    patchify,
    pixel_shuffle,
    rms_norm,
    rope_sincos,
    sdpa,
    swiglu,
)
from vtp_tpu.ops.activations import quick_gelu  # noqa: E402
from vtp_tpu.ops.ffn import swiglu_hidden_dim  # noqa: E402


def allclose(a, b, atol=1e-5, rtol=1e-5, what=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)


def test_rope_tables_match_reference():
    for H, W in [(16, 16), (14, 14), (4, 7)]:
        ref = RopePositionEmbedding(
            embed_dim=768, num_heads=12, base=100.0, normalize_coords="separate",
            dtype=torch.bfloat16,
        )
        sin_t, cos_t = ref(H=H, W=W)
        periods = jnp.asarray(ref.periods.float().numpy(), jnp.bfloat16)
        sin_j, cos_j = rope_sincos(periods, H, W, normalize_coords="separate")
        allclose(sin_j.astype(jnp.float32), sin_t.float().numpy(), atol=1e-6, what="sin")
        allclose(cos_j.astype(jnp.float32), cos_t.float().numpy(), atol=1e-6, what="cos")


def test_rope_min_max_period_parametrization():
    ref = RopePositionEmbedding(
        embed_dim=384, num_heads=6, base=None, min_period=0.5, max_period=90.0,
        dtype=torch.float32,
    )
    from vtp_tpu.ops.rope import rope_periods_init

    ours = rope_periods_init(64, base=None, min_period=0.5, max_period=90.0, dtype=jnp.float32)
    allclose(ours, ref.periods.numpy(), atol=1e-6)


def test_rms_norm_matches(rng):
    x = rng.standard_normal((4, 17, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    ref = RMSNorm(64)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w))
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()
    out_j = rms_norm(jnp.asarray(x), jnp.asarray(w))
    allclose(out_j, out_t, atol=1e-6)


def test_layer_norm_matches(rng):
    x = rng.standard_normal((4, 17, 64)).astype(np.float32)
    ref = LayerNorm(64, eps=1e-6)
    with torch.no_grad():
        ref.weight.copy_(torch.randn(64))
        ref.bias.copy_(torch.randn(64))
    out_t = ref(torch.from_numpy(x)).detach().numpy()
    out_j = layer_norm(
        jnp.asarray(x), jnp.asarray(ref.weight.detach().numpy()),
        jnp.asarray(ref.bias.detach().numpy()), eps=1e-6,
    )
    allclose(out_j, out_t, atol=1e-5)


def test_swiglu_matches(rng):
    torch.manual_seed(0)
    ref = SwiGLUFFN(in_features=64, hidden_features=256, align_to=8)
    x = rng.standard_normal((3, 10, 64)).astype(np.float32)
    out_t = ref(torch.from_numpy(x)).detach().numpy()

    assert swiglu_hidden_dim(64, 4.0, 8) == ref.w1.out_features
    params = {
        "w1": {"kernel": jnp.asarray(ref.w1.weight.detach().numpy().T),
               "bias": jnp.asarray(ref.w1.bias.detach().numpy())},
        "w2": {"kernel": jnp.asarray(ref.w2.weight.detach().numpy().T),
               "bias": jnp.asarray(ref.w2.bias.detach().numpy())},
        "w3": {"kernel": jnp.asarray(ref.w3.weight.detach().numpy().T),
               "bias": jnp.asarray(ref.w3.bias.detach().numpy())},
    }
    out_j = swiglu(jnp.asarray(x), params)
    allclose(out_j, out_t, atol=1e-5)


def test_quick_gelu(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    ref = torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))
    allclose(quick_gelu(jnp.asarray(x)), ref.numpy(), atol=1e-6)


def test_sdpa_matches(rng):
    q = rng.standard_normal((2, 4, 17, 32)).astype(np.float32)
    k = rng.standard_normal((2, 4, 17, 32)).astype(np.float32)
    v = rng.standard_normal((2, 4, 17, 32)).astype(np.float32)
    out_t = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    out_j = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), use_flash=False)
    allclose(out_j, out_t, atol=1e-5)


def test_sdpa_causal_matches(rng):
    q = rng.standard_normal((2, 4, 9, 32)).astype(np.float32)
    out_t = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(q), torch.from_numpy(q), is_causal=True
    ).numpy()
    out_j = sdpa(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), is_causal=True, use_flash=False)
    allclose(out_j, out_t, atol=1e-5)


def test_self_attention_with_rope_matches(rng):
    """Full SelfAttention incl. RoPE prefix handling (attention.py:41-126)."""
    torch.manual_seed(1)
    dim, heads, n = 64, 2, 17  # 1 cls + 16 patches
    ref = SelfAttention(dim, num_heads=heads, qkv_bias=True).eval()
    rope_ref = RopePositionEmbedding(embed_dim=dim, num_heads=heads, base=100.0,
                                     dtype=torch.bfloat16)
    x = rng.standard_normal((2, n, dim)).astype(np.float32)
    sin_t, cos_t = rope_ref(H=4, W=4)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), rope=(sin_t, cos_t)).numpy()

    periods = jnp.asarray(rope_ref.periods.float().numpy(), jnp.bfloat16)
    sin_j, cos_j = rope_sincos(periods, 4, 4)
    from vtp_tpu.ops.rope import pad_rope_prefix

    sin_j, cos_j = pad_rope_prefix(sin_j, cos_j, 1)  # cls prefix, identity rotation

    p = {
        "qkv": {"kernel": jnp.asarray(ref.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.qkv.bias.detach().numpy())},
        "proj": {"kernel": jnp.asarray(ref.proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(ref.proj.bias.detach().numpy())},
    }
    from vtp_tpu.models.blocks import BlockConfig, attention_apply

    cfg = BlockConfig(dim=dim, num_heads=heads)
    xj = jnp.asarray(x).reshape(-1, dim)
    out_j = attention_apply(xj, [(2, n)], p, cfg, [(sin_j, cos_j)], None).reshape(2, n, dim)
    allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


def test_patchify_matches_conv(rng):
    torch.manual_seed(2)
    ref = PatchEmbed(img_size=64, patch_size=16, in_chans=3, embed_dim=96)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()  # (B, N, D)
    w = ref.proj.weight.detach().numpy()  # (D, 3, 16, 16)
    kernel = jnp.asarray(w.reshape(w.shape[0], -1).T)
    out_j = patchify(jnp.asarray(x), kernel, jnp.asarray(ref.proj.bias.detach().numpy()), patch=16)
    allclose(out_j, out_t, atol=1e-4, rtol=1e-4)


def test_pixel_shuffle_matches(rng):
    x = rng.standard_normal((2, 3 * 16, 4, 5)).astype(np.float32)
    out_t = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 4).numpy()
    out_j = pixel_shuffle(jnp.asarray(x), 4)
    allclose(out_j, out_t, atol=0)


def test_mlp_matches(rng):
    torch.manual_seed(3)
    ref = Mlp(in_features=32, hidden_features=64)
    x = rng.standard_normal((5, 32)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x)).numpy()
    from vtp_tpu.ops.ffn import mlp as mlp_op
    from vtp_tpu.ops.activations import gelu_exact

    params = {
        "fc1": {"kernel": jnp.asarray(ref.fc1.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.fc1.bias.detach().numpy())},
        "fc2": {"kernel": jnp.asarray(ref.fc2.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.fc2.bias.detach().numpy())},
    }
    allclose(mlp_op(jnp.asarray(x), params, gelu_exact), out_t, atol=1e-5)


def test_fused_attention_kernel_interpret_mode(rng, kernels):
    """Fused qkv+rope+attention kernel logic vs the pure-JAX reference
    composition, via the Pallas interpreter (no TPU needed)."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import (
        _fused_kernel_call,
        _fused_reference_impl,
    )

    B, N, H, d = 2, 17, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)

    got = _fused_kernel_call(qkv, sin_t, cos_t, H)
    want = _fused_reference_impl(qkv, sin_t, cos_t, None, None, H)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )

    # with qk-norm
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    got = _fused_kernel_call(qkv, sin_t, cos_t, H, q_scale=qs, k_scale=ks)
    want = _fused_reference_impl(qkv, sin_t, cos_t, qs, ks, H)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_fused_attention_gradients(rng, kernels):
    """custom_vjp backward (pure-JAX recompute) is finite and matches
    grads of the reference composition."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import (
        _fused_reference_impl,
        fused_qkv_rope_attention,
    )

    B, N, H, d = 1, 9, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)

    g1 = jax.grad(lambda x: jnp.sum(
        fused_qkv_rope_attention(x, sin_t, cos_t, H).astype(jnp.float32) ** 2
    ))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(
        _fused_reference_impl(x, sin_t, cos_t, None, None, H).astype(jnp.float32) ** 2
    ))(qkv)
    assert bool(jnp.isfinite(g1).all())
    # primal outputs differ by bf16 rounding order (one- vs three-rounding
    # rope), so the cotangents differ proportionally — loose tolerance
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-2, rtol=5e-2)


def test_fused_attention_backward_kernel(rng, kernels):
    """Dedicated Pallas backward kernel vs the einsum-composition VJP
    oracle (interpret mode), with rope, key masking, and plain."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import (
        _fused_bwd_kernel_call,
        _fused_reference_impl,
    )

    B, N, H, d = 2, 16, 2, 32
    for use_rope, n_valid in [(True, 0), (False, 0), (True, 13)]:
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, N, H * d)), jnp.bfloat16)
        sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if use_rope else None
        cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if use_rope else None

        got = _fused_bwd_kernel_call(qkv, g, sin_t, cos_t, H, n_valid=n_valid)

        def f(x):
            out = _fused_reference_impl(x, sin_t, cos_t, None, None, H, n_valid=n_valid)
            return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

        want = jax.grad(f)(qkv.astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2,
            err_msg=f"use_rope={use_rope} n_valid={n_valid}",
        )


def test_fused_attention_backward_kernel_qk_norm(rng, kernels):
    """qk-norm arm of the dedicated backward kernel (the DiT training
    path): d(qkv) AND the q/k scale grads vs the einsum-composition VJP
    oracle, with and without rope."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import (
        _fused_bwd_kernel_call,
        _fused_reference_impl,
    )

    B, N, H, d = 2, 16, 2, 32
    for use_rope in (True, False):
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, N, H * d)), jnp.bfloat16)
        sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if use_rope else None
        cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if use_rope else None
        qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
        ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

        d_qkv, dws = _fused_bwd_kernel_call(
            qkv, g, sin_t, cos_t, H, q_scale=qs, k_scale=ks)
        dwq = dws[:, 0, :].sum(0).reshape(H, d).sum(0)
        dwk = dws[:, 1, :].sum(0).reshape(H, d).sum(0)

        def f(x, wq, wk):
            out = _fused_reference_impl(x, sin_t, cos_t, wq, wk, H)
            return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

        want, want_wq, want_wk = jax.grad(f, argnums=(0, 1, 2))(
            qkv.astype(jnp.float32), qs, ks)
        np.testing.assert_allclose(
            np.asarray(d_qkv, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f"d_qkv use_rope={use_rope}",
        )
        # scale grads accumulate over B*N*H rows — scale tolerance to
        # the bf16 stats-dot noise of that accumulation
        np.testing.assert_allclose(
            np.asarray(dwq), np.asarray(want_wq), atol=0.3, rtol=5e-2,
            err_msg=f"dwq use_rope={use_rope}")
        np.testing.assert_allclose(
            np.asarray(dwk), np.asarray(want_wk), atol=0.3, rtol=5e-2,
            err_msg=f"dwk use_rope={use_rope}")


def test_fused_attention_qk_norm_vjp_dispatch(rng, kernels):
    """fused_qkv_rope_attention's custom_vjp routes bf16 qk-norm
    configs through the backward kernel: finite grads for qkv and both
    scales, zero rope-table cotangents."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    B, N, H, d = 1, 8, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    qs = jnp.ones((d,), jnp.float32)
    ks = jnp.ones((d,), jnp.float32)

    def loss(x, s, c, wq, wk):
        return jnp.sum(fused_qkv_rope_attention(
            x, s, c, H, q_scale=wq, k_scale=wk).astype(jnp.float32) ** 2)

    gx, gs, gc, gwq, gwk = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        qkv, sin_t, cos_t, qs, ks)
    assert bool(jnp.isfinite(gx).all()) and float(jnp.abs(gx).max()) > 0
    assert gwq.shape == (d,) and gwk.shape == (d,)
    assert bool(jnp.isfinite(gwq).all()) and float(jnp.abs(gwq).max()) > 0
    assert bool(jnp.isfinite(gwk).all()) and float(jnp.abs(gwk).max()) > 0
    assert float(jnp.abs(gs).max()) == 0.0
    assert float(jnp.abs(gc).max()) == 0.0


def test_fused_attention_backward_dispatch(rng, kernels):
    """fused_qkv_rope_attention's custom_vjp routes bf16 no-qk-norm
    configs through the backward kernel and returns zero rope-table
    cotangents (periods are a non-trained buffer in the reference)."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    B, N, H, d = 1, 8, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)

    def loss(x, s, c):
        return jnp.sum(fused_qkv_rope_attention(x, s, c, H).astype(jnp.float32) ** 2)

    gx, gs, gc = jax.grad(loss, argnums=(0, 1, 2))(qkv, sin_t, cos_t)
    assert bool(jnp.isfinite(gx).all()) and float(jnp.abs(gx).max()) > 0
    assert float(jnp.abs(gs).max()) == 0.0
    assert float(jnp.abs(gc).max()) == 0.0


def test_fused_attention_causal(rng, kernels):
    """In-kernel causal masking (text tower path) vs the reference
    composition, forward and backward."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import (
        _fused_bwd_kernel_call,
        _fused_kernel_call,
        _fused_reference_impl,
    )

    B, N, H, d = 2, 11, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    got = _fused_kernel_call(qkv, None, None, H, is_causal=True)
    want = _fused_reference_impl(qkv, None, None, None, None, H, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )

    g = jnp.asarray(rng.standard_normal((B, N, H * d)), jnp.bfloat16)
    got_g = _fused_bwd_kernel_call(qkv, g, None, None, H, is_causal=True)

    def f(x):
        out = _fused_reference_impl(x, None, None, None, None, H, is_causal=True)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    want_g = jax.grad(f)(qkv.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got_g, np.float32), np.asarray(want_g, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_fused_attention_fp32_precision_modes(rng, kernels):
    """fp32 kernel: 'high' (manual 3-pass bf16x3 split) must track the
    exact 6-pass 'float32' mode to within the bf16x3 error bound."""
    kernels(interpret=True)
    from vtp_tpu.ops.flash_attention import _fused_kernel_call, _fused_reference_impl

    B, N, H, d = 2, 16, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.float32)
    want = _fused_reference_impl(qkv, None, None, None, None, H)
    got6 = _fused_kernel_call(qkv, None, None, H, fp32_precision="float32")
    got3 = _fused_kernel_call(qkv, None, None, H, fp32_precision="high")
    np.testing.assert_allclose(np.asarray(got6), np.asarray(want), atol=1e-5)
    # 3-pass vs 6-pass: bf16x3 residual only (<< any bf16 path noise)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(got6), atol=1e-4)


def test_fused_attention_fallback_zero_rope_cotangents(rng, kernels):
    """The recompute-VJP fallback (fp32 configs, VMEM-gated qk-norm
    shapes, VTP_DISABLE_BWD_KERNEL) must ALSO return zero rope-table
    cotangents — training semantics must not depend on which arm the
    dispatch picked (the periods are a non-trained buffer in the
    reference, embeddings.py:124-128)."""
    kernels(interpret=True, disable_bwd_kernel=True)
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    B, N, H, d = 1, 8, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16)
    qs = jnp.ones((d,), jnp.float32)
    ks = jnp.ones((d,), jnp.float32)

    def loss(x, s, c, wq, wk):
        return jnp.sum(fused_qkv_rope_attention(
            x, s, c, H, q_scale=wq, k_scale=wk).astype(jnp.float32) ** 2)

    gx, gs, gc, gwq, gwk = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        qkv, sin_t, cos_t, qs, ks)
    assert float(jnp.abs(gx).max()) > 0
    assert float(jnp.abs(gs).max()) == 0.0
    assert float(jnp.abs(gc).max()) == 0.0
    assert float(jnp.abs(gwq).max()) > 0  # scale grads still flow
