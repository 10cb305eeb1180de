"""Tests for train/optim.py: reduced-precision Adam moment storage.

The fp32 path must be bit-identical to optax.adamw (it delegates); the
custom scale_by_adam_moments transform itself must match optax exactly
when storing fp32; the bf16 path must carry bf16 state and track the
fp32 trajectory to sub-percent error over many steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vtp_tpu.train.optim import adamw, resolve_moment_dtype, scale_by_adam_moments


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": jax.random.normal(k1, (16, 8), jnp.float32),
        "b": jax.random.normal(k2, (8,), jnp.float32) * 0.1,
        "scale": jax.random.normal(k3, (4, 4), jnp.float32),
    }


def _run(opt, params, grads_seq):
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


@pytest.fixture()
def problem():
    params = _tree(jax.random.key(0))
    grads_seq = [_tree(jax.random.key(i + 1)) for i in range(25)]
    return params, grads_seq


def test_fp32_moments_bit_exact_vs_optax(problem):
    """The hand-rolled transform (fp32 storage) is bit-identical to
    optax.scale_by_adam over a 25-step trajectory."""
    params, grads = problem
    ours = optax.chain(
        scale_by_adam_moments(b1=0.9, b2=0.95, eps=1e-8, moment_dtype=None),
        optax.add_decayed_weights(0.04),
        optax.scale_by_learning_rate(1e-3),
    )
    ref = optax.adamw(1e-3, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.04)
    p_ours = _run(ours, params, grads)
    p_ref = _run(ref, params, grads)
    for a, b in zip(jax.tree.leaves(p_ours), jax.tree.leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adamw_fp32_delegates_to_optax(problem):
    params, grads = problem
    assert resolve_moment_dtype("fp32") is None
    assert resolve_moment_dtype(None) is None
    p_ours = _run(adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.04,
                        moment_dtype=None), params, grads)
    p_ref = _run(optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.04),
                 params, grads)
    for a, b in zip(jax.tree.leaves(p_ours), jax.tree.leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_moments_dtype_and_trajectory(problem):
    """bf16 mode stores bf16 moments and stays within sub-percent
    parameter error of the fp32 trajectory after 25 steps."""
    params, grads = problem
    opt = adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.04,
                moment_dtype=resolve_moment_dtype("bf16"))
    state = opt.init(params)
    adam_state = state[0]  # scale_by_adam_moments in the chain
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(adam_state.mu))
    assert all(v.dtype == jnp.bfloat16 for v in jax.tree.leaves(adam_state.nu))

    p_bf16 = _run(opt, params, grads)
    p_fp32 = _run(optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.04),
                  params, grads)
    # parameter drift: relative to the total update magnitude
    for a, b, p0 in zip(jax.tree.leaves(p_bf16), jax.tree.leaves(p_fp32),
                        jax.tree.leaves(params)):
        upd = np.linalg.norm(np.asarray(b) - np.asarray(p0))
        err = np.linalg.norm(np.asarray(a) - np.asarray(b))
        assert err < 0.02 * upd, (err, upd)


def test_resolve_moment_dtype_rejects_unknown():
    with pytest.raises(ValueError):
        resolve_moment_dtype("fp16")


def test_train_step_runs_with_bf16_moments():
    """Integration: one VTP train step with moment_dtype='bf16' runs
    and produces finite metrics; opt_state carries bf16 moments."""
    from vtp_tpu.config import VTPConfig
    from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

    cfg = VTPConfig(
        image_size=32, vision_patch_size=16, vision_embed_dim=32,
        vision_depth=1, vision_num_heads=2, vision_feature_bottleneck=8,
        text_context_length=8, text_vocab_size=64, text_embed_dim=32,
        text_num_heads=2, text_depth=1, decoder_embed_dim=32,
        decoder_num_heads=2, decoder_depth=1,
    )
    tcfg = TrainConfig(
        train_ssl=False, dino_out_dim=32, dino_hidden_dim=16,
        dino_bottleneck_dim=8, warmup_steps=0, total_steps=4,
        moment_dtype="bf16",
    )
    state = init_state(jax.random.key(0), cfg, tcfg)
    moments = state["opt_state"][1][0]
    assert all(m.dtype == jnp.bfloat16 for m in jax.tree.leaves(moments.mu))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 3, 32, 32)),
        "text": jax.random.randint(jax.random.key(2), (2, 8), 1, 63),
        "rec_image": jax.random.normal(jax.random.key(1), (2, 3, 32, 32)),
    }
    step = jax.jit(build_train_step(cfg, tcfg))
    state, metrics = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss/total"]))


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    """orbax save/restore preserves bf16 moment dtype and values (the
    restore template comes from a fresh init with the same tcfg)."""
    from vtp_tpu.checkpoint import restore_train_state, save_train_state
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

    cfg = make_dit_config("DiT-B/1", depth=1, dim=64, num_heads=2,
                          in_channels=4, input_size=4)
    tcfg = DiTTrainConfig(remat=False, unroll_layers=True, moment_dtype="bf16")
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    lat = jax.random.normal(jax.random.key(1), (2, 4, 4, 4))
    lab = jnp.zeros((2,), jnp.int32)
    state, _ = step(state, lat, lab, jax.random.key(2))

    save_train_state(str(tmp_path / "t"), state, step=1)
    template = init_dit_state(jax.random.key(3), cfg, tcfg)
    restored = restore_train_state(str(tmp_path / "t"), template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_moment_dtype_mismatch(tmp_path):
    """Resuming with a different --moment_dtype than the checkpoint was
    written with must error instead of silently casting the moments
    (ADVICE r3): the guard compares template vs stored leaf dtypes."""
    from vtp_tpu.checkpoint import restore_train_state, save_train_state
    from vtp_tpu.dit.model import make_dit_config
    from vtp_tpu.dit.train import DiTTrainConfig, init_dit_state

    dcfg = make_dit_config("DiT-B/1", depth=1, dim=64, num_heads=2,
                           in_channels=4, input_size=2)
    state = init_dit_state(
        jax.random.key(0), dcfg, DiTTrainConfig(moment_dtype="fp32"))
    save_train_state(str(tmp_path / "t"), state, step=1)

    bad_template = init_dit_state(
        jax.random.key(0), dcfg, DiTTrainConfig(moment_dtype="bf16"))
    with pytest.raises(ValueError, match="moment_dtype"):
        restore_train_state(str(tmp_path / "t"), bad_template)
    # escape hatch casts explicitly
    restored = restore_train_state(
        str(tmp_path / "t"), bad_template, allow_dtype_mismatch=True)
    assert int(restored["step"]) == int(state["step"])


def test_moment_dtype_consistent_when_grads_differ(problem):
    """store() must carry the INIT moment dtype even when grad dtype
    differs from param dtype (ADVICE r3: the old g.dtype fallback
    changed the carried dtype after the first update)."""
    params, grads_seq = problem
    tx = scale_by_adam_moments(b1=0.9, b2=0.95, moment_dtype=None)
    state = tx.init(params)  # moments in param dtype (fp32)
    bf_grads = jax.tree.map(lambda g: g.astype(jnp.bfloat16), grads_seq[0])
    _, state = tx.update(bf_grads, state)
    for leaf in jax.tree.leaves(state.mu) + jax.tree.leaves(state.nu):
        assert leaf.dtype == jnp.float32
