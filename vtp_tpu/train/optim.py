"""AdamW with reduced-precision moment storage.

The reference trains with torch AdamW (fp32 moments throughout; e.g.
the DiT recipe in ``generation/configs/train_vtp_l_dit_xl.yaml`` and
the accelerate-driven trainer it launches). On a 16 GB v5e the
optimizer/EMA tail of a big step is HBM-bandwidth-bound: the DiT-XL/1
step spends ~35 ms/step streaming the 675M-param fp32 state (params +
EMA + Adam m + v + grads ≈ 30 GB of traffic at ~700 GB/s effective —
PERF.md round 3b).

``adamw(..., moment_dtype=jnp.bfloat16)`` stores the first and second
Adam moments in bf16 while computing every update in fp32:

- traffic: m and v each drop from 5.4 GB read+write to 2.7 GB per
  step at DiT-XL scale (~8 ms saved at the measured HBM floor);
- memory: the train state shrinks by one fp32 param copy (2.7 GB at
  DiT-XL) — enough to re-enable configurations that otherwise OOM
  (fp32 grad accumulators, larger sampling batches).

Numerics: bf16 shares fp32's exponent range, so no clipping occurs;
only the mantissa rounds (~0.4 % relative). The update direction
``m̂/(sqrt(v̂)+eps)`` therefore carries sub-percent noise, far below
batch noise — but it IS a deviation from the reference's fp32
optimizer, so it is opt-in (``moment_dtype="fp32"`` default keeps the
bit-exact optax path).

With ``moment_dtype=None``/fp32 this module is bit-identical to
``optax.adamw`` (asserted by tests/test_optim.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def _bias_correction(decay, count):
    return 1.0 - decay ** count.astype(jnp.float32)


def scale_by_adam_moments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with both moments stored in ``moment_dtype``.

    optax's own ``mu_dtype`` covers only the first moment; the second
    moment (the larger bandwidth cost — it is read, squared-accumulated
    and written every step) stays fp32 there. All arithmetic here runs
    in fp32; only the carried state is cast.
    """

    def init_fn(params):
        def zeros(p):
            return jnp.zeros_like(p, dtype=moment_dtype or p.dtype)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        # saturating increment (optax parity): a plain int32 +1 would
        # wrap at 2^31 steps and flip the bias correction
        count = optax.safe_increment(state.count)
        mu = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            updates, state.mu,
        )
        nu = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g,
            updates, state.nu,
        )
        bc1 = _bias_correction(b1, count)
        bc2 = _bias_correction(b2, count)
        new_updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )

        def store(x, old):
            # carried dtype must match init_fn's (moment_dtype, falling
            # back to the EXISTING moment leaf's dtype — not the grad's,
            # which may differ and would retrace/diverge from the
            # checkpoint template after the first update)
            return x.astype(moment_dtype or old.dtype)

        return new_updates, optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(store, mu, state.mu),
            nu=jax.tree.map(store, nu, state.nu),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW; ``moment_dtype`` selects the storage dtype of m and v.

    ``moment_dtype in (None, jnp.float32)`` delegates to ``optax.adamw``
    (bit-exact reference behavior); ``jnp.bfloat16`` switches to the
    reduced-precision carrier above.
    """
    if moment_dtype in (None, jnp.float32):
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        )
    return optax.chain(
        scale_by_adam_moments(b1=b1, b2=b2, eps=eps, moment_dtype=moment_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def resolve_moment_dtype(name: Optional[str]):
    """Config-string → dtype. Accepts 'fp32'/'float32'/None and
    'bf16'/'bfloat16'."""
    if name in (None, "fp32", "float32"):
        return None
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unknown moment_dtype {name!r} (use 'fp32' or 'bf16')")
