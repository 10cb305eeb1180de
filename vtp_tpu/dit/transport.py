"""Flow-matching transport: linear path, velocity prediction, euler ODE.

Matches the reference's shipped DiT configs
(generation/configs/train_vtp_l_dit_xl.yaml): ``transport: velocity /
Linear`` with cosine-similarity auxiliary loss and logit-normal
timestep sampling (mu/sigma per model size), sampled with an euler ODE
at 250 steps and ``timestep_shift`` resolution shifting, cfg available
but 1.0 (off) for the headline numbers.

Conventions: t in [0, 1]; x_t = t * x1 + (1 - t) * x0 with x0 ~ N(0, I)
noise and x1 data; velocity target v = x1 - x0.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def sample_timesteps(
    key: jax.Array,
    batch: int,
    *,
    use_lognorm: bool = True,
    mu: float = -0.75,
    sigma: float = 1.0,
) -> jax.Array:
    """Logit-normal timestep sampling (t = sigmoid(mu + sigma * eps));
    uniform when disabled."""
    if use_lognorm:
        return jax.nn.sigmoid(mu + sigma * jax.random.normal(key, (batch,)))
    return jax.random.uniform(key, (batch,))


def training_losses(
    model_fn: Callable,
    key: jax.Array,
    x1: jax.Array,
    y: jax.Array,
    *,
    use_lognorm: bool = True,
    mu: float = -0.75,
    sigma: float = 1.0,
    use_cosine_loss: bool = True,
    cosine_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Velocity-matching MSE + optional cosine-direction loss."""
    k_t, k_noise = jax.random.split(key)
    B = x1.shape[0]
    t = sample_timesteps(k_t, B, use_lognorm=use_lognorm, mu=mu, sigma=sigma)
    x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
    tb = t[:, None, None, None]
    xt = tb * x1 + (1.0 - tb) * x0
    target = x1 - x0

    pred = model_fn(xt, t, y)
    mse = jnp.mean((pred - target) ** 2)
    metrics = {"loss/mse": mse}
    loss = mse
    if use_cosine_loss:
        p = pred.reshape(B, -1)
        g = target.reshape(B, -1)
        # eps inside the sqrt: the zero-init (adaLN-zero) model predicts
        # exactly 0 at step 1, where the plain norm VJP is 0/0 = NaN
        pn = jnp.sqrt(jnp.sum(p * p, -1) + 1e-8)
        gn = jnp.sqrt(jnp.sum(g * g, -1) + 1e-8)
        cos = jnp.sum(p * g, -1) / (pn * gn)
        cos_loss = jnp.mean(1.0 - cos)
        metrics["loss/cos"] = cos_loss
        loss = loss + cosine_weight * cos_loss
    metrics["loss/transport"] = loss
    return loss, metrics


def metric_keys(use_cosine_loss: bool) -> tuple:
    """Keys of the metrics dict training_losses returns for this
    config — the single source for accumulator trees
    (dit/train.zero_grad_accumulators)."""
    keys = ["loss/mse"]
    if use_cosine_loss:
        keys.append("loss/cos")
    keys.append("loss/transport")
    return tuple(keys)


def shift_timesteps(t: jax.Array, shift: float) -> jax.Array:
    """Resolution-dependent timestep shift (SD3-style):
    t' = shift * t / (1 + (shift - 1) * t). The reference configs use
    timestep_shift=0.075, concentrating steps near the data end."""
    if shift is None or shift == 1.0:
        return t
    return shift * t / (1.0 + (shift - 1.0) * t)


def euler_sample(
    model_fn: Callable,
    key: jax.Array,
    shape: Tuple[int, ...],
    y: jax.Array,
    *,
    num_steps: int = 250,
    timestep_shift: float = 0.075,
    cfg_scale: float = 1.0,
    null_label: Optional[int] = None,
) -> jax.Array:
    """Integrate dx/dt = v(x, t, y) from t=0 (noise) to t=1 (data) with
    euler steps on the shifted time grid; optional classifier-free
    guidance when cfg_scale > 1."""
    x = jax.random.normal(key, shape)
    grid = shift_timesteps(jnp.linspace(0.0, 1.0, num_steps + 1), timestep_shift)

    use_cfg = cfg_scale != 1.0 and null_label is not None
    if use_cfg:
        y_null = jnp.full_like(y, null_label)

    def velocity(x, t_scalar):
        t = jnp.full((shape[0],), t_scalar)
        if use_cfg:
            v_cond = model_fn(x, t, y)
            v_null = model_fn(x, t, y_null)
            return v_null + cfg_scale * (v_cond - v_null)
        return model_fn(x, t, y)

    def step(i, x):
        t0 = grid[i]
        dt = grid[i + 1] - grid[i]
        return x + dt * velocity(x, t0)

    return jax.lax.fori_loop(0, num_steps, step, x)
