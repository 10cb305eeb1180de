"""Training state: student params, EMA teacher, optimizer state, DINO centers.

Mirrors the reference meta-arch's teacher construction (vtp.py:244-273):
the teacher holds EMA copies of the trunk, the CLIP projection and the
DINO head. ``update_teacher`` (vtp.py:388-401) becomes a pytree lerp.

The state is a plain dict pytree, so it shards/checkpoints with
jax.sharding / orbax directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

TrainState = Dict[str, Any]


def ema_update(teacher: Any, student: Any, momentum: jax.Array | float) -> Any:
    """teacher <- m * teacher + (1-m) * student (vtp.py:392-401)."""
    return jax.tree.map(
        lambda t, s: momentum * t + (1.0 - momentum) * s, teacher, student
    )


def make_teacher(params: dict) -> dict:
    """EMA-tracked subset: trunk + visual_proj + dino_head."""
    teacher = {"trunk": params["trunk"]}
    if "visual_proj" in params:
        teacher["visual_proj"] = params["visual_proj"]
    if "dino_head" in params:
        teacher["dino_head"] = params["dino_head"]
    return jax.tree.map(jnp.copy, teacher)


def create_train_state(
    params: dict,
    opt_state: Any,
    *,
    dino_out_dim: Optional[int] = None,
    enable_teacher: bool = True,
) -> TrainState:
    state: TrainState = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
    }
    if enable_teacher and "dino_head" in params:
        state["teacher"] = make_teacher(params)
        state["dino_center"] = jnp.zeros((dino_out_dim,), jnp.float32)
        state["ibot_center"] = jnp.zeros((dino_out_dim,), jnp.float32)
    return state
