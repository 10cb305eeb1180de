"""LR / momentum / weight-decay schedules.

``CosineScheduler`` reproduces the reference's precomputed-table
scheduler (vtp/models/utils/text_utils.py:160-207): freeze -> linear
warmup -> cosine decay -> trunc-zeros, indexable by iteration. A pure
functional ``cosine_schedule`` is provided for optax.
"""

from __future__ import annotations

import math

import numpy as np


class CosineScheduler:
    """Precomputed numpy schedule table, indexable like the reference."""

    def __init__(
        self,
        base_value: float,
        final_value: float,
        total_iters: int,
        warmup_iters: int = 0,
        start_warmup_value: float = 0.0,
        freeze_iters: int = 0,
        trunc_extra: float = 0.0,
    ):
        self.final_value = final_value
        self.total_iters = total_iters

        freeze_schedule = np.zeros(freeze_iters)
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)
        trunc_iters = int(trunc_extra * total_iters)
        cosine_iters = max(total_iters - warmup_iters - freeze_iters + trunc_iters, 0)
        iters = np.arange(cosine_iters)
        cosine = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * iters / max(cosine_iters, 1))
        )
        schedule = np.concatenate((freeze_schedule, warmup_schedule, cosine))[:total_iters]
        if len(schedule) < total_iters:
            schedule = np.concatenate(
                (schedule, np.full(total_iters - len(schedule), final_value))
            )
        self.schedule = schedule
        assert len(self.schedule) == self.total_iters

    def __getitem__(self, it: int) -> float:
        if it >= self.total_iters:
            return float(self.final_value)
        return float(self.schedule[it])


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    start_warmup_value: float = 0.0,
):
    """JAX-traceable step -> value function for optax inject_hyperparams."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_value + (base_value - start_warmup_value) * (
            step / max(warmup_steps, 1)
        )
        t = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = final_value + 0.5 * (base_value - final_value) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn
