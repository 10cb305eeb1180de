"""Ring attention (ops/ring_attention.py): online-softmax K/V rotation
over a seq-sharded mesh must equal full SDPA, forward and backward."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vtp_tpu.models.blocks import sdpa_bnhd
from vtp_tpu.ops.ring_attention import ring_attention


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _mesh_cp(n_seq, n_data=1):
    from vtp_tpu.parallel.mesh import make_cp_mesh

    return make_cp_mesh(n_seq, n_data, devices=jax.devices()[: n_seq * n_data])


def _qkv(b=2, n=32, h=2, d=8, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return tuple(
        jax.random.normal(k, (b, n, h, d), dtype) for k in ks
    )


def test_ring_attention_matches_sdpa():
    mesh = _mesh()
    q, k, v = _qkv()
    out = ring_attention(q, k, v, mesh=mesh)
    ref = sdpa_bnhd(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ring_attention_bf16():
    mesh = _mesh()
    q, k, v = _qkv(dtype=jnp.bfloat16)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = sdpa_bnhd(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_ring_attention_grads_match():
    mesh = _mesh(4)
    q, k, v = _qkv(n=16)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_bnhd(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


def test_ring_attention_divisibility_error():
    mesh = _mesh()
    q, k, v = _qkv(n=20)  # 20 % 8 != 0
    try:
        ring_attention(q, k, v, mesh=mesh)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divide" in str(e)


def test_ring_attention_n_valid_masks_padded_keys():
    """Global-column key masking (token-alignment padding) must match
    sdpa_bnhd's n_valid mask — including shards whose KV block is
    entirely padding."""
    mesh = _mesh()
    q, k, v = _qkv(n=32)
    for n_valid in (17, 25, 31):
        out = ring_attention(q, k, v, mesh=mesh, n_valid=n_valid)
        ref = sdpa_bnhd(q, k, v, n_valid=n_valid)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"n_valid={n_valid}",
        )


def test_ring_attention_n_valid_grads():
    mesh = _mesh(4)
    q, k, v = _qkv(n=16)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            # padded query rows are sliced off downstream — exclude them
            return jnp.sum(o[:, :9] ** 2)
        return f

    g_ring = jax.grad(
        loss(lambda q, k, v: ring_attention(q, k, v, mesh=mesh, n_valid=9)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        loss(lambda q, k, v: sdpa_bnhd(q, k, v, n_valid=9)), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
            err_msg=f"d{name}",
        )


# ---- context-parallel dispatch: the model's attention rides the ring
# automatically under an ambient mesh with a `seq` axis ----------------


def test_sdpa_dispatches_to_ring_under_cp_mesh():
    from vtp_tpu.parallel.mesh import make_cp_mesh

    mesh = make_cp_mesh(8)
    q, k, v = _qkv()
    want = sdpa_bnhd(q, k, v)  # no mesh: XLA path
    with jax.set_mesh(mesh):
        fn = jax.jit(sdpa_bnhd)
        hlo = fn.lower(q, k, v).compile().as_text()
        got = fn(q, k, v)
    assert "collective-permute" in hlo, "expected the ppermute KV ring"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_ring_supported_gates():
    from vtp_tpu.parallel.mesh import make_cp_mesh, make_mesh
    from vtp_tpu.ops.ring_attention import ring_supported

    q, _, _ = _qkv(n=32)
    assert ring_supported(q, make_cp_mesh(8))
    assert not ring_supported(q, None)
    assert not ring_supported(q, make_mesh(4, 2))  # no seq axis
    q20, _, _ = _qkv(n=20)
    assert not ring_supported(q20, make_cp_mesh(8))  # 20 % 8
    # batch over data must also split cleanly
    q3, _, _ = _qkv(b=3, n=32)
    assert ring_supported(q3, make_cp_mesh(4, 2)) is False


def test_vit_encode_under_cp_mesh(kernels):
    """Whole-encoder context parallelism through the public API: a ViT
    forward under `jax.set_mesh(make_cp_mesh(8))` must equal the
    single-device forward, with the token dim (incl. alignment padding
    => n_valid ring masking) sharded over `seq`."""
    kernels(force_token_pad=True)  # N=17 -> 24, n_valid=17
    from vtp_tpu.models.vit import ViTConfig, init_vit_params, vit_forward_features
    from vtp_tpu.parallel.mesh import make_cp_mesh

    cfg = ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8)
    params = init_vit_params(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (2, 3, 32, 32), jnp.float32)

    want = vit_forward_features(params, cfg, img)
    mesh = make_cp_mesh(8)
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p, x: vit_forward_features(p, cfg, x)
        )(params, img)
    for key in ("x_norm_clstoken", "x_norm_patchtokens"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]),
            rtol=2e-5, atol=2e-5, err_msg=key,
        )


# ---- Ulysses (all-to-all) CP arm -------------------------------------


def test_ulysses_attention_matches_sdpa():
    from vtp_tpu.ops.ring_attention import ulysses_attention_bnhd

    mesh = _mesh_cp(4)
    q, k, v = _qkv(h=8)
    out = ulysses_attention_bnhd(q, k, v, mesh=mesh)
    ref = sdpa_bnhd(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ulysses_n_valid_masks_padded_keys():
    from vtp_tpu.ops.ring_attention import ulysses_attention_bnhd

    mesh = _mesh_cp(4)
    q, k, v = _qkv(n=32, h=4)
    for n_valid in (17, 31):
        out = ulysses_attention_bnhd(q, k, v, mesh=mesh, n_valid=n_valid)
        ref = sdpa_bnhd(q, k, v, n_valid=n_valid)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"n_valid={n_valid}",
        )


def test_ulysses_grads_match():
    from vtp_tpu.ops.ring_attention import ulysses_attention_bnhd

    mesh = _mesh_cp(4)
    q, k, v = _qkv(n=16, h=4)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_uly = jax.grad(
        loss(lambda q, k, v: ulysses_attention_bnhd(q, k, v, mesh=mesh)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(loss(sdpa_bnhd), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_uly, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
            err_msg=f"d{name}",
        )


def test_ulysses_supported_gates():
    from vtp_tpu.parallel.mesh import make_cp_mesh
    from vtp_tpu.ops.ring_attention import ulysses_supported

    q8, _, _ = _qkv(h=8)
    assert ulysses_supported(q8, make_cp_mesh(8))
    q2, _, _ = _qkv(h=2)
    assert not ulysses_supported(q2, make_cp_mesh(8))  # 2 heads % 8
    assert ulysses_supported(q2, _mesh_cp(2, 2))  # heads % seq ok, B % data ok
    assert not ulysses_supported(q2, _mesh_cp(2, 4))  # B=2 % data=4


def test_sdpa_dispatches_to_ulysses_when_heads_divide():
    from vtp_tpu.parallel.mesh import make_cp_mesh

    mesh = make_cp_mesh(8)
    q, k, v = _qkv(h=8)
    want = sdpa_bnhd(q, k, v)
    with jax.set_mesh(mesh):
        fn = jax.jit(sdpa_bnhd)
        hlo = fn.lower(q, k, v).compile().as_text()
        got = fn(q, k, v)
    assert "all-to-all" in hlo, "expected the Ulysses all-to-all arm"
    assert "collective-permute" not in hlo
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_cp_mode_forces_ring():
    """make_cp_mesh(mode="ring") forces the ring arm on a Ulysses-eligible
    layout. Flipping the mode for an already-registered mesh signature
    clears the jit caches (parallel/mesh.make_cp_mesh), so jitting
    sdpa_bnhd ITSELF — the exact function+shapes the Ulysses test above
    compiled — must re-trace onto the ring, not reuse the stale entry."""
    from vtp_tpu.parallel.mesh import make_cp_mesh

    q, k, v = _qkv(h=8)  # ulysses-eligible, but forced to the ring
    want = sdpa_bnhd(q, k, v)
    mesh = make_cp_mesh(8, mode="ring")
    try:
        with jax.set_mesh(mesh):
            fn = jax.jit(sdpa_bnhd)
            hlo = fn.lower(q, k, v).compile().as_text()
            got = fn(q, k, v)
    finally:
        make_cp_mesh(8, mode="auto")  # restore for other tests
    assert "collective-permute" in hlo
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_ring_backward_saves_only_flash_residuals():
    """The custom ring VJP (ops/ring_attention._ring_sdpa_bwd) must keep
    the backward at 1/S token liveness: exactly {q, k, v, o, lse} home
    shards saved, with the adjoint re-running its own KV ring. Naive
    autodiff of the forward scan saves stacked per-step residuals —
    including the (S, B, Nl, H, S*Nl) score/probability matrices, i.e.
    O(N^2/S) per chip (measured: 16 residuals, ~2.4 MB at this toy shape
    vs 40 KB for the custom path). Guard both the count and the bytes so
    a regression to autodiff (or a residual leak) fails loudly."""
    import contextlib
    import io
    import re

    from jax.ad_checkpoint import print_saved_residuals
    from vtp_tpu.ops.ring_attention import ring_attention_bnhd

    mesh = _mesh()
    q, k, v = _qkv(b=2, n=64, h=2, d=8, dtype=jnp.bfloat16)  # Nl=8

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_saved_residuals(
            lambda a, b, c: ring_attention_bnhd(a, b, c, mesh=mesh), q, k, v
        )
    res = [
        ln.split()[0] for ln in buf.getvalue().splitlines() if ln.strip()
    ]  # e.g. "bf16[2,64,2,8] from the argument a"
    assert len(res) == 5, res  # q, k, v, o, lse — nothing else
    # stacked per-step saves carry a leading scan dim (5-d) — none may
    # survive, and no (.., N, .., N) score/probability save either
    for shape in res:
        dims = [int(d) for d in re.search(r"\[([0-9,]*)\]", shape).group(1)
                .split(",") if d]
        assert len(dims) <= 4, res
        assert dims.count(64) <= 1, res  # no (N, N) score matrix

    def loss(q, k, v):
        return jnp.sum(
            ring_attention_bnhd(q, k, v, mesh=mesh).astype(jnp.float32) ** 2
        )

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in (dq, dk, dv):
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
