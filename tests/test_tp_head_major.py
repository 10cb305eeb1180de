"""Head-major TP qkv layout (parallel.sharding.qkv_head_major).

Under a model-parallel mesh the packed qkv GEMM output's contiguous
column shards straddle the Q/K/V thirds, which disengaged the fused
qkv+rope+attention kernels (measured +47% step time — PERF.md round 5).
Permuting the qkv parameter columns into rank-major [Q_r|K_r|V_r]
groups makes each model shard a canonical packed qkv for its heads, so
the fused kernels (fwd + both bwd arms) run per-shard over
(data, model) with zero extra collectives.

Parity is against our own canonical-layout path (the torch reference
is DDP-only, SURVEY §2.8); kernels run in Pallas interpret mode on the
8-virtual-CPU-device mesh (conftest).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.parallel.mesh import make_mesh
from vtp_tpu.parallel.sharding import permute_trunk_qkv, qkv_head_major


@pytest.fixture(autouse=True)
def _interpret(kernels):
    kernels(interpret=True)


def _mk(rng, B=8, N=16, H=4, d=32, rope=True):
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * d)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if rope else None
    cos_t = jnp.asarray(rng.standard_normal((N, d)) * 0.5, jnp.bfloat16) if rope else None
    return qkv, sin_t, cos_t


def test_permutation_roundtrip_and_semantics(rng):
    H, d, tp = 4, 8, 2
    D = H * d
    w = jnp.asarray(rng.standard_normal((5, 3 * D)), jnp.float32)
    back = qkv_head_major(qkv_head_major(w, H, tp), H, tp, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(w))

    # column semantics: label column (t, h, i) as t*1000 + h*10 + i and
    # check rank r's contiguous chunk is [Q of its heads | K | V]
    labels = np.array(
        [t * 1000 + h * 10 + i for t in range(3) for h in range(H) for i in range(d)],
        np.float32,
    )
    perm = np.asarray(qkv_head_major(jnp.asarray(labels), H, tp))
    per_rank = 3 * D // tp
    for r in range(tp):
        chunk = perm[r * per_rank:(r + 1) * per_rank]
        want = np.array(
            [t * 1000 + h * 10 + i
             for t in range(3)
             for h in range(r * H // tp, (r + 1) * H // tp)
             for i in range(d)],
            np.float32,
        )
        np.testing.assert_array_equal(chunk, want)


def test_fused_forward_head_major_tp(rng):
    """Fused kernel over head-major activations under a (data, model)
    mesh == the canonical kernel single-device (same per-head math)."""
    from vtp_tpu.ops.flash_attention import (
        fused_attention_supported,
        fused_qkv_rope_attention,
    )

    qkv, sin_t, cos_t = _mk(rng)
    H, tp = 4, 2
    want = fused_qkv_rope_attention(qkv, sin_t, cos_t, H)  # canonical, no mesh

    qkv_hm = qkv_head_major(qkv, H, tp)  # activation columns permute alike
    mesh = make_mesh(4, tp)
    with jax.set_mesh(mesh):
        # canonical layout under a model mesh must NOT engage ...
        assert not fused_attention_supported(qkv.shape, qkv.dtype, H)
        # ... the head-major layout must
        assert fused_attention_supported(qkv.shape, qkv.dtype, H,
                                         head_major=tp)
        got = jax.jit(
            lambda x: fused_qkv_rope_attention(x, sin_t, cos_t, H,
                                               head_shards=tp)
        )(qkv_hm)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
    # permuted weights WITHOUT the matching mesh -> XLA fallback
    assert not fused_attention_supported(qkv.shape, qkv.dtype, H, head_major=tp)


def test_fused_backward_head_major_tp(rng):
    """d(qkv) through the dedicated backward kernel under the TP mesh ==
    the permutation of the canonical gradient (the loss is layout-
    invariant, so cotangents just follow the column permutation)."""
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, sin_t, cos_t = _mk(rng)
    H, tp = 4, 2

    def loss(fn):
        return lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)

    want = jax.grad(loss(
        lambda x: fused_qkv_rope_attention(x, sin_t, cos_t, H)
    ))(qkv)
    qkv_hm = qkv_head_major(qkv, H, tp)
    mesh = make_mesh(4, tp)
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(loss(
            lambda x: fused_qkv_rope_attention(x, sin_t, cos_t, H,
                                               head_shards=tp)
        )))(qkv_hm)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(qkv_head_major(want, H, tp), np.float32),
        atol=1e-6, rtol=1e-6,
    )


def test_fused_qk_norm_head_major_tp(rng):
    """The qk-norm arm (in-kernel RMSNorm + scale grads) under the TP
    mesh: per-rank head groups reduce their scale grads over model."""
    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention

    qkv, sin_t, cos_t = _mk(rng)
    H, d, tp = 4, 32, 2
    qs = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)
    ks = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0)

    def loss(hs):
        return lambda x, wq, wk: jnp.sum(
            fused_qkv_rope_attention(
                x, sin_t, cos_t, H, q_scale=wq, k_scale=wk, head_shards=hs
            ).astype(jnp.float32) ** 2)

    want = jax.grad(loss(1), argnums=(0, 1, 2))(qkv, qs, ks)
    qkv_hm = qkv_head_major(qkv, H, tp)
    mesh = make_mesh(4, tp)
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(loss(tp), argnums=(0, 1, 2)))(qkv_hm, qs, ks)
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32),
        np.asarray(qkv_head_major(want[0], H, tp), np.float32),
        atol=1e-4, rtol=1e-4, err_msg="d_qkv",
    )
    for g, w, name in zip(got[1:], want[1:], ("dwq", "dwk")):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-4, rtol=1e-4, err_msg=name,
        )


def test_no_collectives_in_fused_tp_forward(rng):
    """The head-major fused forward under (data, model) must compile to
    ZERO collectives — that is the whole point of the layout (each
    rank's GEMM emits its packed microlayout directly)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtp_tpu.ops.flash_attention import fused_qkv_rope_attention
    from vtp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    qkv, sin_t, cos_t = _mk(rng)
    H, tp = 4, 2
    qkv_hm = qkv_head_major(qkv, H, tp)
    mesh = make_mesh(4, tp)
    with jax.set_mesh(mesh):
        qkv_s = jax.device_put(
            qkv_hm, NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS)))
        fn = jax.jit(lambda x: fused_qkv_rope_attention(
            x, sin_t, cos_t, H, head_shards=tp))
        txt = fn.lower(qkv_s).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" not in txt
    assert "all-to-all" not in txt


def _block_setup(rng, mask_k_bias=False, use_qk_norm=False):
    from vtp_tpu.models.blocks import BlockConfig, init_block_params

    cfg = BlockConfig(dim=128, num_heads=4, mask_k_bias=mask_k_bias,
                      use_qk_norm=use_qk_norm)
    p = init_block_params(jax.random.key(0), cfg)
    B, N, hd = 8, 16, 32
    x = jnp.asarray(rng.standard_normal((B * N, cfg.dim)), jnp.bfloat16)
    sin_t = jnp.asarray(rng.standard_normal((N, hd)) * 0.5, jnp.bfloat16)
    cos_t = jnp.asarray(rng.standard_normal((N, hd)) * 0.5, jnp.bfloat16)
    return cfg, p, x, [(B, N)], [(sin_t, cos_t)]


@pytest.mark.parametrize("mask_k_bias,use_qk_norm", [
    (False, False), (True, False), (False, True),
])
def test_attention_apply_head_major_parity(rng, mask_k_bias, use_qk_norm):
    """Model-level dispatch: permuted weights + qkv_head_major config
    under the TP mesh == canonical single-device, on BOTH the kernel
    path and the XLA fallback (disable_flash)."""
    from vtp_tpu.models.blocks import attention_apply
    from vtp_tpu.ops.dispatch import kernel_overrides

    cfg, p, x, shapes, ropes = _block_setup(rng, mask_k_bias, use_qk_norm)
    tp = 2
    want = attention_apply(x, shapes, p["attn"], cfg, ropes, jnp.bfloat16)

    p_hm = {"attn": dict(p["attn"])}
    p_hm["attn"]["qkv"] = {
        "kernel": qkv_head_major(p["attn"]["qkv"]["kernel"], cfg.num_heads, tp),
        "bias": qkv_head_major(p["attn"]["qkv"]["bias"], cfg.num_heads, tp),
    }
    cfg_hm = dataclasses.replace(cfg, qkv_head_major=tp)
    mesh = make_mesh(4, tp)
    with jax.set_mesh(mesh):
        got_kernel = jax.jit(
            lambda f: attention_apply(f, shapes, p_hm["attn"], cfg_hm,
                                      ropes, jnp.bfloat16)
        )(x)
    with kernel_overrides(disable_flash=True):
        with jax.set_mesh(mesh):
            got_xla = jax.jit(
                lambda f: attention_apply(f, shapes, p_hm["attn"], cfg_hm,
                                          ropes, jnp.bfloat16)
            )(x)
    np.testing.assert_allclose(
        np.asarray(got_kernel, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got_xla, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_config_declares_layout_and_init_follows(rng):
    """vision_qkv_head_major is a self-describing checkpoint layout tag:
    it round-trips through the config json and init_vtp_params emits
    params in the declared layout (exact permutation of the canonical
    init for the same key)."""
    from tests.test_cp_train import TINY
    from vtp_tpu.config import VTPConfig
    from vtp_tpu.models.vtp_model import init_vtp_params

    cfg_hm = dataclasses.replace(TINY, vision_qkv_head_major=2)
    back = VTPConfig.from_dict(cfg_hm.to_dict())
    assert back.vision_qkv_head_major == 2

    p_can = init_vtp_params(jax.random.key(0), TINY)
    p_hm = init_vtp_params(jax.random.key(0), cfg_hm)
    np.testing.assert_array_equal(
        np.asarray(p_hm["trunk"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(qkv_head_major(
            p_can["trunk"]["blocks"]["attn"]["qkv"]["kernel"],
            TINY.vision_num_heads, 2)),
    )
    # every other leaf untouched
    np.testing.assert_array_equal(
        np.asarray(p_hm["trunk"]["blocks"]["attn"]["proj"]["kernel"]),
        np.asarray(p_can["trunk"]["blocks"]["attn"]["proj"]["kernel"]),
    )


def test_export_canonicalizes_layout():
    """Exported HF/torch state dicts are ALWAYS canonical [Q|K|V]:
    exporting a head-major checkpoint must produce the bit-identical
    state dict of its canonical twin."""
    from tests.test_cp_train import TINY
    from vtp_tpu.convert.to_torch import export_state_dict
    from vtp_tpu.models.vtp_model import init_vtp_params

    cfg_hm = dataclasses.replace(TINY, vision_qkv_head_major=2)
    sd_can = export_state_dict(init_vtp_params(jax.random.key(0), TINY), TINY)
    sd_hm = export_state_dict(init_vtp_params(jax.random.key(0), cfg_hm), cfg_hm)
    assert set(sd_can) == set(sd_hm)
    for k in sd_can:
        np.testing.assert_array_equal(sd_can[k], sd_hm[k], err_msg=k)


def test_pure_fn_parity_under_config_layout(rng):
    """The public pure functions honor the config's layout tag: encode
    with head-major params + tagged config under a (data, model) mesh ==
    the canonical encode single-device."""
    from tests.test_cp_train import TINY
    from vtp_tpu.models.vtp_model import (
        get_reconstruction_latents, init_vtp_params,
    )

    cfg_hm = dataclasses.replace(TINY, vision_qkv_head_major=2)
    p_can = init_vtp_params(jax.random.key(0), TINY)
    p_hm = init_vtp_params(jax.random.key(0), cfg_hm)
    img = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), jnp.float32)

    want = jax.jit(lambda p, x: get_reconstruction_latents(p, TINY, x))(p_can, img)
    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, x: get_reconstruction_latents(p, cfg_hm, x))(p_hm, img)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_serve_tp_head_major(rng):
    """VTPServer(mesh=(data, model), tp_head_major=True) permutes the
    loaded canonical trunk, tags the config, and serves the same
    latents as the single-device model."""
    from tests.test_serve import TINY as STINY
    from vtp_tpu.models.vtp_model import VTPModel
    from vtp_tpu.serve import VTPServer

    model_ref = VTPModel.init(jax.random.key(0), STINY, encode_dtype=None)
    img = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    want = np.asarray(model_ref.get_reconstruction_latents(img))

    model_tp = VTPModel.init(jax.random.key(0), STINY, encode_dtype=None)
    srv = VTPServer(model_tp, batch_size=4, max_wait_ms=20, warmup=False,
                    mesh=make_mesh(4, 2), tp_head_major=True)
    try:
        assert model_tp.config.vision_qkv_head_major == 2
        got = srv.submit_encode(img).result(timeout=300)
    finally:
        srv.shutdown()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_train_step_tp_head_major(kernels):
    """Full CLIP+rec train step with TrainConfig.tp_head_major under a
    (data, model) mesh: loss and grad norm match the canonical
    single-device step; updated params match through the inverse
    permutation."""
    from tests.test_cp_train import TINY, TTINY, _batch
    from vtp_tpu.train.step import build_train_step, init_state

    batch = _batch()
    state0 = init_state(jax.random.key(0), TINY, TTINY)
    step = build_train_step(TINY, TTINY)
    out_r, metrics_r = jax.jit(step)(state0, batch, jax.random.key(3))

    tcfg_hm = dataclasses.replace(TTINY, tp_head_major=2)
    state_hm = init_state(jax.random.key(0), TINY, tcfg_hm)
    # init permutes the trunk qkv of the SAME canonical init
    np.testing.assert_array_equal(
        np.asarray(state_hm["params"]["trunk"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(qkv_head_major(
            state0["params"]["trunk"]["blocks"]["attn"]["qkv"]["kernel"],
            TINY.vision_num_heads, 2)),
    )
    step_hm = build_train_step(TINY, tcfg_hm)
    mesh = make_mesh(4, 2)
    with jax.set_mesh(mesh):
        out_h, metrics_h = jax.jit(step_hm)(state_hm, batch, jax.random.key(3))

    np.testing.assert_allclose(
        float(metrics_h["loss/total"]), float(metrics_r["loss/total"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(metrics_h["grad_norm"]), float(metrics_r["grad_norm"]),
        rtol=1e-4,
    )
    # updated trunks agree through the inverse permutation (same
    # tolerance rationale as test_train_step_under_cp_mesh)
    tr = jax.device_get(out_r["params"]["trunk"])
    th = jax.device_get(permute_trunk_qkv(
        out_h["params"]["trunk"], TINY.vision_num_heads, 2, inverse=True))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3, rtol=5e-3),
        tr, th,
    )


def test_serve_tp_head_major_invalidates_prior_jit(rng):
    """Regression: jit entries created BEFORE VTPServer permutes the
    params closed over the canonical-layout config and would slice the
    permuted qkv columns as [Q|K|V] — VTPServer must clear the model's
    jit cache when it applies the head-major layout."""
    from tests.test_serve import TINY as STINY
    from vtp_tpu.models.vtp_model import VTPModel
    from vtp_tpu.serve import VTPServer

    img = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    model = VTPModel.init(jax.random.key(0), STINY, encode_dtype=None)
    want = np.asarray(model.get_reconstruction_latents(img))  # caches jit
    assert model._jitted, "expected a populated jit cache before the server"

    srv = VTPServer(model, batch_size=4, max_wait_ms=20, warmup=False,
                    mesh=make_mesh(4, 2), tp_head_major=True)
    try:
        got = srv.submit_encode(img).result(timeout=300)
    finally:
        srv.shutdown()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
