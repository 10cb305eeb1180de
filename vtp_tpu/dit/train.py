"""DiT training step + latent-shard data pipeline.

Configured like the reference YAMLs
(generation/configs/train_vtp_l_dit_xl.yaml): AdamW lr 2e-4 beta2 0.95,
global batch 1024, 100k steps, velocity/Linear transport with cosine
loss and logit-normal(mu, sigma) time sampling, EMA weights, latents
normalized by the extracted per-channel stats, random flip via the
precomputed latents_flip, label dropout for cfg.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vtp_tpu.dit.model import DiTConfig, dit_forward, init_dit_params
from vtp_tpu.dit.transport import training_losses
from vtp_tpu.train.optim import adamw, resolve_moment_dtype
from vtp_tpu.train.state import ema_update


@dataclasses.dataclass(frozen=True)
class DiTTrainConfig:
    learning_rate: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    total_steps: int = 100_000
    warmup_steps: int = 0
    ema_decay: float = 0.9999
    use_lognorm: bool = True
    lognorm_mu: float = -0.75   # VTP-L setup; S/B use (-0.5, 1.25)
    lognorm_sigma: float = 1.0
    use_cosine_loss: bool = True
    class_dropout_prob: float = 0.1
    compute_dtype: Optional[str] = "bf16"
    remat: Union[bool, str] = True
    unroll_layers: bool = False
    # gradient accumulation: latents/labels carry a leading
    # (accum_steps,) microbatch axis; grads average before ONE
    # optimizer/EMA update (the reference DiT configs train at global
    # batch 1024 — generation/configs/train_vtp_l_dit_xl.yaml)
    accum_steps: int = 1
    # accumulator dtype for the host-driven microbatch loop
    # (build_dit_microbatch_steps). fp32 matches the reference; at
    # DiT-XL/1 on one 16 GB v5e the fp32 accumulator does not fit next
    # to the 10.8 GB train state (measured: XLA drops donation aliasing
    # under the pressure, then OOMs) — "bf16" halves it and fits.
    # Multi-chip sharding makes this moot (state/8 per chip).
    accum_dtype: str = "fp32"
    # Adam moment storage dtype: "fp32" (bit-exact optax/torch AdamW)
    # or "bf16" (halves optimizer HBM traffic + frees one fp32 param
    # copy of state memory at DiT-XL scale — train/optim.py)
    moment_dtype: str = "fp32"

    @property
    def jnp_compute_dtype(self):
        return {None: None, "bf16": jnp.bfloat16, "fp32": None}[self.compute_dtype]


def make_dit_optimizer(tcfg: DiTTrainConfig) -> optax.GradientTransformation:
    if tcfg.warmup_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, tcfg.learning_rate, tcfg.warmup_steps,
            max(tcfg.total_steps, tcfg.warmup_steps + 1), 0.0,
        )
    else:
        schedule = tcfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        adamw(schedule, b1=tcfg.beta1, b2=tcfg.beta2,
              weight_decay=tcfg.weight_decay,
              moment_dtype=resolve_moment_dtype(tcfg.moment_dtype)),
    )


def init_dit_state(key: jax.Array, cfg: DiTConfig, tcfg: DiTTrainConfig) -> Dict:
    params = init_dit_params(key, cfg)
    return {
        "params": params,
        "ema": jax.tree.map(jnp.copy, params),
        "opt_state": make_dit_optimizer(tcfg).init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def _make_loss_and_grads(cfg: DiTConfig, tcfg: DiTTrainConfig):
    cdt = tcfg.jnp_compute_dtype

    def _loss_and_grads(params, latents, labels, key):
        k_drop, k_loss = jax.random.split(key)
        # classifier-free label dropout
        drop = jax.random.uniform(k_drop, labels.shape) < tcfg.class_dropout_prob
        y = jnp.where(drop, cfg.null_label, labels)

        def loss_fn(params):
            model_fn = lambda xt, t, yy: dit_forward(
                params, cfg, xt, t, yy, compute_dtype=cdt, remat=tcfg.remat,
                unroll=tcfg.unroll_layers
            )
            return training_losses(
                model_fn, k_loss, latents, y,
                use_lognorm=tcfg.use_lognorm,
                mu=tcfg.lognorm_mu, sigma=tcfg.lognorm_sigma,
                use_cosine_loss=tcfg.use_cosine_loss,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, metrics

    return _loss_and_grads


def _apply_grads(optimizer, tcfg: DiTTrainConfig, state: Dict, grads, metrics):
    """Shared optimizer/EMA/step tail of both accumulation
    implementations (in-jit scan and host-driven microbatch loop) —
    one copy so a clipping/EMA change cannot diverge them."""
    updates, opt_state = optimizer.update(
        grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    new_state = {
        "params": params,
        "ema": ema_update(state["ema"], params, tcfg.ema_decay),
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def build_dit_train_step(cfg: DiTConfig, tcfg: DiTTrainConfig):
    optimizer = make_dit_optimizer(tcfg)
    _loss_and_grads = _make_loss_and_grads(cfg, tcfg)

    def train_step(state: Dict, latents: jax.Array, labels: jax.Array, key: jax.Array):
        if tcfg.accum_steps <= 1:
            grads, metrics = _loss_and_grads(state["params"], latents, labels, key)
        else:
            accum = tcfg.accum_steps
            keys = jax.random.split(key, accum)
            g0, m0 = _loss_and_grads(
                state["params"], latents[0], labels[0], keys[0]
            )
            g0 = jax.tree.map(lambda g: g.astype(jnp.float32), g0)

            def body(carry, xs):
                lat, lab, k = xs
                g_sum, m_sum = carry
                g, m = _loss_and_grads(state["params"], lat, lab, k)
                g_sum = jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), g_sum, g
                )
                return (g_sum, jax.tree.map(jnp.add, m_sum, m)), None

            (g_sum, m_sum), _ = jax.lax.scan(
                body, (g0, m0), (latents[1:], labels[1:], keys[1:])
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            metrics = jax.tree.map(lambda m: m / accum, m_sum)

        return _apply_grads(optimizer, tcfg, state, grads, metrics)

    return train_step


def build_dit_microbatch_steps(cfg: DiTConfig, tcfg: DiTTrainConfig):
    """Host-driven gradient accumulation for models whose in-jit
    accumulation scan exceeds XLA's HBM plan: at DiT-XL/1 B=32 the
    28-layer body inside the microbatch ``lax.scan`` plus the fp32 grad
    carry plans 23.9 MB over the 15.75 GB v5e HBM (measured; the
    identical accum=1 graph fits with room). The trainer instead
    drives two small jits in a Python loop — same math, HLO size of a
    single microbatch, one extra f32 grad-tree read-modify-write per
    microbatch (~10 ms at DiT-XL against a ~230 ms microbatch).

    Returns ``(micro_step, apply_step)``:
      micro_step(params, g_sum, m_sum, latents, labels, key)
          -> (g_sum', m_sum')   # donate g_sum/m_sum
      apply_step(state, g_sum, m_sum) -> (state', metrics)  # donate both
    where g_sum/m_sum start as zeros_like trees (fp32 grads / metric
    scalars) and apply_step divides by ``tcfg.accum_steps``."""
    optimizer = make_dit_optimizer(tcfg)
    _loss_and_grads = _make_loss_and_grads(cfg, tcfg)
    accum = max(1, int(tcfg.accum_steps))
    adt = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[tcfg.accum_dtype]

    def micro_step(params, g_sum, m_sum, latents, labels, key):
        g, m = _loss_and_grads(params, latents, labels, key)
        # add in fp32, store in the accumulator dtype
        g_sum = jax.tree.map(
            lambda a, b: (a.astype(jnp.float32)
                          + b.astype(jnp.float32)).astype(adt), g_sum, g)
        return g_sum, jax.tree.map(jnp.add, m_sum, m)

    def apply_step(state, g_sum, m_sum):
        grads = jax.tree.map(lambda g: g.astype(jnp.float32) / accum, g_sum)
        metrics = jax.tree.map(lambda m: m / accum, m_sum)
        return _apply_grads(optimizer, tcfg, state, grads, metrics)

    return micro_step, apply_step


def run_accum_step(micro_fn, apply_fn, tcfg: DiTTrainConfig, state: Dict,
                   latents: jax.Array, labels: jax.Array, key: jax.Array):
    """Drive ONE optimizer step of host accumulation: latents/labels
    carry a leading (accum_steps,) microbatch axis; the key splits per
    microbatch exactly like build_dit_train_step's in-jit scan (the
    equality test pins this contract). ``micro_fn``/``apply_fn`` are
    the (jitted) pair from build_dit_microbatch_steps."""
    keys = jax.random.split(key, tcfg.accum_steps)
    g_sum, m_sum = zero_grad_accumulators(state["params"], tcfg)
    for i in range(tcfg.accum_steps):
        g_sum, m_sum = micro_fn(state["params"], g_sum, m_sum,
                                latents[i], labels[i], keys[i])
    return apply_fn(state, g_sum, m_sum)


def zero_grad_accumulators(params, tcfg: DiTTrainConfig):
    """Fresh (g_sum, m_sum) trees for the microbatch loop (metric keys
    come from transport.metric_keys — the single source)."""
    from vtp_tpu.dit.transport import metric_keys

    adt = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[tcfg.accum_dtype]
    g_sum = jax.tree.map(lambda p: jnp.zeros(p.shape, adt), params)
    m_sum = {k: jnp.zeros((), jnp.float32)
             for k in metric_keys(tcfg.use_cosine_loss)}
    return g_sum, m_sum


class LatentShardDataset:
    """Iterates (latents, labels) batches from extracted safetensors
    shards with per-channel normalization and flip augmentation via the
    precomputed ``latents_flip`` (extract_features_vtp.py layout)."""

    def __init__(self, shard_dir: str, *, latent_norm: bool = True, seed: int = 0):
        from vtp_tpu.generation.latents import list_latent_shards, load_latent_stats

        self.paths = list_latent_shards(shard_dir)
        if not self.paths:
            raise FileNotFoundError(f"no latent shards in {shard_dir}")
        self.mean = self.std = None
        if latent_norm:
            mean, std = load_latent_stats(shard_dir)
            self.mean, self.std = mean.astype(np.float32), std.astype(np.float32)
        self.seed = seed

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from safetensors.numpy import load_file

        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            order = rng.permutation(len(self.paths))
            for pi in order:
                shard = load_file(self.paths[pi])
                n = shard["latents"].shape[0]
                perm = rng.permutation(n)
                for s in range(0, n - batch_size + 1, batch_size):
                    idx = perm[s : s + batch_size]
                    flip = rng.random(batch_size) < 0.5
                    z = np.where(
                        flip[:, None, None, None],
                        shard["latents_flip"][idx],
                        shard["latents"][idx],
                    ).astype(np.float32)
                    if self.mean is not None:
                        z = (z - self.mean) / self.std
                    yield z, shard["labels"][idx].astype(np.int32)
            epoch += 1
