"""Native latent DiT: forward semantics, training, sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtp_tpu.dit.model import DiTConfig, dit_forward, init_dit_params
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state
from vtp_tpu.dit.transport import euler_sample, sample_timesteps, shift_timesteps

TINY = DiTConfig(input_size=4, patch_size=1, in_channels=8, dim=64, depth=2,
                 num_heads=2, num_classes=10)


def test_forward_shapes_and_zero_init():
    params = init_dit_params(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (3, 8, 4, 4))
    t = jnp.asarray([0.1, 0.5, 0.9])
    y = jnp.asarray([0, 5, TINY.null_label])
    out = dit_forward(params, TINY, x, t, y, compute_dtype=None)
    assert out.shape == x.shape
    # adaLN-zero + zero-init final proj -> exact zero output at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_patchify_roundtrip_patch2():
    cfg = DiTConfig(input_size=4, patch_size=2, in_channels=8, dim=64, depth=1,
                    num_heads=2, num_classes=10)
    params = init_dit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 8, 4, 4))
    out = dit_forward(params, cfg, x, jnp.asarray([0.5, 0.5]), jnp.asarray([0, 1]),
                      compute_dtype=None)
    assert out.shape == x.shape


def test_timestep_sampling_and_shift():
    t = sample_timesteps(jax.random.key(0), 10_000, use_lognorm=True, mu=-0.75, sigma=1.0)
    assert float(t.min()) > 0 and float(t.max()) < 1
    # logit-normal with negative mu concentrates mass below 0.5
    assert float(jnp.mean(t < 0.5)) > 0.6
    s = shift_timesteps(jnp.asarray([0.0, 0.5, 1.0]), 0.075)
    np.testing.assert_allclose(np.asarray(s), [0.0, 0.075 / 1.075 * 2 * 0.5 / (2 * 0.5), 1.0], atol=1e-6)
    assert float(s[1]) < 0.5  # shift < 1 pushes times toward 0


def test_train_step_learns():
    tcfg = DiTTrainConfig(learning_rate=1e-3, total_steps=100, ema_decay=0.9,
                          class_dropout_prob=0.1)
    state = init_dit_state(jax.random.key(0), TINY, tcfg)
    step = jax.jit(build_dit_train_step(TINY, tcfg))

    # toy dataset: class-dependent constant latents
    protos = jax.random.normal(jax.random.key(1), (10, 8, 4, 4))
    losses = []
    for i in range(60):
        k = jax.random.fold_in(jax.random.key(2), i)
        y = jax.random.randint(jax.random.fold_in(k, 1), (16,), 0, 10)
        z = protos[y]
        state, metrics = step(state, z, y, k)
        losses.append(float(metrics["loss/transport"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # EMA tracked
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state["params"], state["ema"])
    assert max(jax.tree.leaves(d)) > 0


def test_euler_sampler_runs():
    params = init_dit_params(jax.random.key(0), TINY)
    model_fn = lambda x, t, y: dit_forward(params, TINY, x, t, y, compute_dtype=None)
    y = jnp.asarray([1, 2])
    out = euler_sample(model_fn, jax.random.key(3), (2, 8, 4, 4), y,
                       num_steps=8, timestep_shift=0.075)
    assert out.shape == (2, 8, 4, 4)
    assert bool(jnp.isfinite(out).all())
    # cfg path
    out_cfg = euler_sample(model_fn, jax.random.key(3), (2, 8, 4, 4), y,
                           num_steps=4, cfg_scale=2.0, null_label=TINY.null_label)
    assert bool(jnp.isfinite(out_cfg).all())


def test_overfit_single_latent_to_near_zero_loss():
    """Training validation (DiT trainer end-to-end): on a single fixed
    latent the velocity target is deterministic given (x_t, t), so the
    transport loss must collapse toward zero."""
    cfg = TINY
    tcfg = DiTTrainConfig(
        learning_rate=2e-3, compute_dtype=None, remat=False,
        class_dropout_prob=0.0, ema_decay=0.99, use_lognorm=False,
    )
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg))
    latent = jax.random.normal(jax.random.key(1), (1, 8, 4, 4))
    latents = jnp.tile(latent, (16, 1, 1, 1))
    labels = jnp.zeros((16,), jnp.int32)

    first = None
    for i in range(400):
        state, metrics = step(state, latents, labels, jax.random.key(10 + i))
        if first is None:
            first = float(metrics["loss/transport"])
    last = float(metrics["loss/transport"])
    assert np.isfinite(last)
    assert last < 0.05 * first, (first, last)
    assert last < 0.15, last


def test_euler_sampler_statistics_against_gaussian_oracle():
    """Sampler validation: integrate the CLOSED-FORM conditional
    velocity of Gaussian data N(m, s^2) through euler_sample (incl. the
    timestep_shift grid) — the terminal samples must reproduce the data
    statistics, the invariant the latents_stats normalization relies on."""
    m, s = 1.5, 0.7

    def oracle(x, t, y):
        t = t[:, None, None, None]
        var = t**2 * s**2 + (1.0 - t) ** 2
        cov = t * s**2 - (1.0 - t)
        return m + cov / var * (x - t * m)

    out = euler_sample(
        oracle, jax.random.key(0), (512, 8, 2, 2), jnp.zeros((512,), jnp.int32),
        num_steps=200, timestep_shift=0.075,
    )
    got_m = float(jnp.mean(out))
    got_s = float(jnp.std(out))
    assert abs(got_m - m) < 0.05, got_m
    assert abs(got_s - s) < 0.05, got_s


def test_train_step_learns_with_accumulation():
    """accum_steps=2: latents/labels carry a leading (2,) microbatch
    axis; grads average before one optimizer/EMA update and the loss
    still decreases on the toy class-conditional task."""
    tcfg = DiTTrainConfig(learning_rate=1e-3, total_steps=100, ema_decay=0.9,
                          class_dropout_prob=0.1, accum_steps=2)
    state = init_dit_state(jax.random.key(0), TINY, tcfg)
    step = jax.jit(build_dit_train_step(TINY, tcfg))

    protos = jax.random.normal(jax.random.key(1), (10, 8, 4, 4))
    losses = []
    for i in range(40):
        k = jax.random.fold_in(jax.random.key(2), i)
        y = jax.random.randint(jax.random.fold_in(k, 1), (2, 8), 0, 10)
        z = protos[y]
        assert z.shape == (2, 8, 8, 4, 4)
        state, metrics = step(state, z, y, k)
        losses.append(float(metrics["loss/transport"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(state["step"]) == 40


def test_host_accumulation_matches_in_jit_scan():
    """build_dit_microbatch_steps (host-driven two-jit accumulation,
    used by tools/train_dit.py for DiT-XL where the in-jit scan
    overplans HBM) produces the same update as build_dit_train_step's
    accum path: identical per-microbatch keys, identical params/ema/
    metrics after one optimizer step."""
    from vtp_tpu.dit.train import (
        build_dit_microbatch_steps,
        zero_grad_accumulators,
    )

    accum = 2
    tcfg = DiTTrainConfig(learning_rate=1e-3, total_steps=100, ema_decay=0.9,
                          class_dropout_prob=0.1, accum_steps=accum)
    state_a = init_dit_state(jax.random.key(0), TINY, tcfg)
    state_b = jax.tree.map(jnp.copy, state_a)

    key = jax.random.key(7)
    y = jax.random.randint(jax.random.key(8), (accum, 8), 0, 10)
    z = jax.random.normal(jax.random.key(9), (accum, 8, 8, 4, 4))

    step = jax.jit(build_dit_train_step(TINY, tcfg))
    state_a, m_a = step(state_a, z, y, key)

    micro, apply_ = build_dit_microbatch_steps(TINY, tcfg)
    micro = jax.jit(micro)
    apply_ = jax.jit(apply_)
    keys = jax.random.split(key, accum)
    g_sum, m_sum = zero_grad_accumulators(state_b["params"], tcfg)
    for i in range(accum):
        g_sum, m_sum = micro(state_b["params"], g_sum, m_sum, z[i], y[i],
                             keys[i])
    state_b, m_b = apply_(state_b, g_sum, m_sum)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-5,
                                   err_msg=k)
    flat_a = jax.tree.leaves(state_a["params"])
    flat_b = jax.tree.leaves(state_b["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state_b["ema"])[0], np.float32),
        np.asarray(jax.tree.leaves(state_a["ema"])[0], np.float32),
        atol=1e-6, rtol=1e-5)


def test_xl_presets_hit_the_fused_attention_kernel():
    """DiT-XL defaults to 18 heads (head_dim 64, same dim/params as the
    16-head LightningDiT-XL) so sampling/training engage the fused
    Pallas attention path instead of the VPU fallback (PERF.md round 3);
    16 heads stays selectable for exact LightningDiT shape parity."""
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.ops.flash_attention import fused_attention_supported

    for preset in ("DiT-XL/1", "DiT-XL/2"):
        cfg = make_dit_config(preset)
        assert cfg.head_dim == 64
        n = cfg.tokens_per_side ** 2
        assert fused_attention_supported(
            (32, n, 3 * cfg.dim), jnp.bfloat16, cfg.num_heads)
    legacy = make_dit_config("DiT-XL/1", num_heads=16)
    assert legacy.head_dim == 72  # LightningDiT shape, XLA fallback path


def test_int8_quantized_dit_forward_and_sampler():
    """int8 W8A8 DiT serving (tools/sample_dit.py --int8): the
    quantized tree drops into dit_forward via ops.ffn.linear's
    dispatch, for scan and unrolled depth loops, and the euler sampler
    stays close to the bf16 path (measured on v5e: 1.45x throughput,
    0.7% compounded 50-step deviation — PERF.md round 3b)."""
    from vtp_tpu.dit.sample import make_sampler
    from vtp_tpu.utils.quantization import quantize_matmul_params

    params = init_dit_params(jax.random.key(0), TINY)
    # perturb away from the adaLN-zero init so outputs are non-trivial
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
        for l, k in zip(leaves, ks)])
    q = quantize_matmul_params(
        params, exclude=lambda k: k in ("x_embed", "final"))

    x = jax.random.normal(jax.random.key(1), (2, 8, 4, 4))
    t = jnp.full((2,), 0.5)
    y = jnp.zeros((2,), jnp.int32)
    v = np.asarray(dit_forward(params, TINY, x, t, y,
                               compute_dtype=jnp.bfloat16), np.float32)
    for unroll in (False, True):
        vq = np.asarray(dit_forward(q, TINY, x, t, y,
                                    compute_dtype=jnp.bfloat16,
                                    unroll=unroll), np.float32)
        rel = np.linalg.norm(vq - v) / np.linalg.norm(v)
        assert rel < 0.15, f"unroll={unroll} rel={rel}"

    sampler = make_sampler(TINY, num_steps=4)
    s = np.asarray(sampler(params, jax.random.key(2), y), np.float32)
    sq = np.asarray(sampler(q, jax.random.key(2), y), np.float32)
    rel = np.linalg.norm(sq - s) / np.linalg.norm(s)
    assert np.isfinite(sq).all() and rel < 0.15, rel
