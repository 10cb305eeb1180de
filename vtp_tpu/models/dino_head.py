"""DINO/iBOT projection head (reference: vtp/models/heads/dino_head.py).

The weight-normalized last layer is stored in decomposed form
(direction ``v`` (in, out) + gain ``g`` (out,)) exactly like torch's
``weight_norm`` parametrization, so converted checkpoints and EMA
updates behave identically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vtp_tpu.models.initializers import linear_init
from vtp_tpu.ops.activations import gelu_exact
from vtp_tpu.ops.ffn import linear


@dataclasses.dataclass(frozen=True)
class DinoHeadConfig:
    in_dim: int = 768
    out_dim: int = 65536
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    mlp_bias: bool = True
    use_weight_norm: bool = True


def init_dino_head_params(key: jax.Array, cfg: DinoHeadConfig) -> dict:
    nlayers = max(cfg.nlayers, 1)
    keys = jax.random.split(key, nlayers + 1)
    mlp = []
    if nlayers == 1:
        mlp.append(linear_init(keys[0], cfg.in_dim, cfg.bottleneck_dim, bias=cfg.mlp_bias))
    else:
        mlp.append(linear_init(keys[0], cfg.in_dim, cfg.hidden_dim, bias=cfg.mlp_bias))
        for i in range(nlayers - 2):
            mlp.append(linear_init(keys[1 + i], cfg.hidden_dim, cfg.hidden_dim, bias=cfg.mlp_bias))
        mlp.append(linear_init(keys[nlayers - 1], cfg.hidden_dim, cfg.bottleneck_dim, bias=cfg.mlp_bias))
    p = {"mlp": {f"layer{i}": lp for i, lp in enumerate(mlp)}}
    if cfg.use_weight_norm:
        # torch: weight_norm(Linear(bottleneck, out)), weight_g filled with 1
        v = linear_init(keys[nlayers], cfg.bottleneck_dim, cfg.out_dim, bias=False)["kernel"]
        p["last_layer"] = {"v": v, "g": jnp.ones((cfg.out_dim,), jnp.float32)}
    else:
        p["last_layer"] = linear_init(keys[nlayers], cfg.bottleneck_dim, cfg.out_dim, bias=False)
    return p


def dino_head_forward(
    params: dict,
    cfg: DinoHeadConfig,
    x: jax.Array,
    *,
    no_last_layer: bool = False,
    only_last_layer: bool = False,
    compute_dtype=None,
    zero_safe_normalize: bool = False,
) -> jax.Array:
    """MLP -> L2 normalize -> weight-normed projection (dino_head.py:65-89).

    ``compute_dtype=bf16`` mirrors torch-autocast training: GEMMs and
    stored activations/logits are bf16 (the 65536-wide prototype logits
    are the dominant SSL-loss HBM traffic; fp32 doubles it), while the
    L2-normalize runs in fp32. Losses upcast per element (train/losses).
    Default None keeps the fp32 eval/parity behavior.

    ``zero_safe_normalize``: training-path option. The torch-faithful
    clamped normalize (``x / max(||x||, eps)``, eps 1e-12) has Jacobian
    ~1/eps = 1e12 on an exactly-zero row — and zero rows DO occur in
    training: a sample dropped from every residual branch by stochastic
    depth leaves its masked patch tokens equal to the zero-initialized
    ``mask_token`` (reference vtp/models/encoders/vision_transformer.py
    mask substitution + zero-init head biases), which at init blows the
    global grad norm to ~1e11 and turns the whole clipped step into a
    near-no-op (measured; PERF.md round 3). With this flag, exactly-zero
    rows emit 0 with a ZERO Jacobian — identical VALUES to torch
    everywhere (a zero row normalizes to 0 either way); only the
    gradient at the measure-zero point differs. Keep False for
    eval/parity."""
    if not only_last_layer:
        n = max(cfg.nlayers, 1)
        for i in range(n):
            x = linear(x, params["mlp"][f"layer{i}"], compute_dtype)
            if i < n - 1:
                x = gelu_exact(x)
        eps = 1e-6 if x.dtype == jnp.float16 else 1e-12
        if compute_dtype is not None:
            x = x.astype(jnp.float32)  # L2 normalize in fp32 (autocast-style)
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        if zero_safe_normalize:
            # zero Jacobian on (near-)zero rows: both where-branches are
            # constant in x there, so no 1/eps factor ever enters the VJP
            is_zero = sq <= eps * eps
            x = jnp.where(is_zero, 0.0, x) / jnp.sqrt(jnp.where(is_zero, 1.0, sq))
        else:
            # Gradient-safe form of torch F.normalize: jnp.linalg.norm's
            # VJP at an exactly-zero row is 0/0 = NaN; the clamped sqrt
            # is finite there (but its Jacobian is 1/eps — see above).
            norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
            x = x / jnp.maximum(norm, eps)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
    if not no_last_layer:
        last = params["last_layer"]
        if "v" in last:
            v, g = last["v"], last["g"]
            # torch weight_norm: W = g * v / ||v|| with the norm over the
            # input dim (dim=0 of torch's (out, in) weight).
            w = v * (g / jnp.linalg.norm(v, axis=0))[None, :]
            if compute_dtype is not None:
                w = w.astype(compute_dtype)
            x = x @ w
        else:
            x = linear(x, last, compute_dtype)
    return x
