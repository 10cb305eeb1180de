"""Linear probing on frozen trunk features.

Behavioral reference: ``tools/test_linear_probing_hf.py``: frozen
features = last-4 intermediate layers with cls tokens (bf16 autocast,
no bottleneck); a grid of linear heads over {n_blocks in (1,4)} x {13
learning rates} x avgpool=True, all trained simultaneously with
SGD(momentum 0.9, wd 0) + cosine annealing for 10 epochs x 1250 iters;
head input = concat of last-n cls tokens + mean patch tokens of the
last layer; LR scaled by global_batch/256; report the best head.

TPU-native design: the 13 same-shape heads per block-count are stacked
on a leading axis and trained as ONE batched matmul (einsum
``bi,lic->lbc``) — 13 heads cost one GEMM; their different LRs are a
broadcast vector in a hand-rolled SGD-momentum update. The frozen trunk
forward and all 26 head updates run in a single jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.vtp_model import get_intermediate_layers_feature

DEFAULT_LEARNING_RATES = (
    1e-5, 2e-5, 5e-5, 1e-4, 2e-4, 5e-4,
    1e-3, 2e-3, 5e-3, 1e-2, 2e-2, 5e-2, 0.1,
)


def extract_features(params, cfg: VTPConfig, images, n_last_blocks: int = 4,
                     compute_dtype=jnp.bfloat16):
    """Frozen feature extractor (test_linear_probing_hf.py:109-130)."""
    return get_intermediate_layers_feature(
        params, cfg, images, n=n_last_blocks, return_class_token=True,
        compute_dtype=compute_dtype,
    )


def create_linear_input(feats, use_n_blocks: int, use_avgpool: bool = True) -> jax.Array:
    """concat last-n cls tokens (+ mean patch tokens of the last layer),
    cast fp32 (test_linear_probing_hf.py:137-152)."""
    last = feats[-use_n_blocks:]
    out = jnp.concatenate([cls for _, cls in last], axis=-1)
    if use_avgpool:
        out = jnp.concatenate([out, jnp.mean(last[-1][0], axis=1)], axis=-1)
    return out.astype(jnp.float32)


@dataclasses.dataclass
class ProbeConfig:
    n_last_blocks_list: Tuple[int, ...] = (1, 4)
    learning_rates: Tuple[float, ...] = DEFAULT_LEARNING_RATES
    num_classes: int = 1000
    epochs: int = 10
    epoch_length: int = 1250
    batch_size: int = 128
    feature_blocks: int = 4  # trunk layers fetched once per batch

    @property
    def max_iter(self) -> int:
        return self.epochs * self.epoch_length


def init_probe_heads(key: jax.Array, cfg: VTPConfig, pcfg: ProbeConfig,
                     global_batch: int) -> Dict:
    """Stacked heads per block-count; weight init N(0, 0.01), zero bias
    (test_linear_probing_hf.py:162-165); lr = base * global_batch / 256."""
    heads = {}
    L = len(pcfg.learning_rates)
    for i, n in enumerate(pcfg.n_last_blocks_list):
        in_dim = cfg.vision_embed_dim * (n + 1)  # n cls + 1 avgpool
        k = jax.random.fold_in(key, i)
        heads[f"n{n}"] = {
            "w": 0.01 * jax.random.normal(k, (L, in_dim, pcfg.num_classes), jnp.float32),
            "b": jnp.zeros((L, pcfg.num_classes), jnp.float32),
            "lr": jnp.asarray(
                [lr * global_batch / 256.0 for lr in pcfg.learning_rates], jnp.float32
            ),
        }
    return heads


def init_probe_state(heads: Dict) -> Dict:
    zeros = lambda h: {"w": jnp.zeros_like(h["w"]), "b": jnp.zeros_like(h["b"])}
    return {
        "heads": heads,
        "momentum": {k: zeros(h) for k, h in heads.items()},
        "step": jnp.zeros((), jnp.int32),
    }


def _head_logits(head: Dict, x: jax.Array) -> jax.Array:
    """(B, in) x (L, in, C) -> (L, B, C)."""
    return jnp.einsum("bi,lic->lbc", x, head["w"]) + head["b"][:, None, :]


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """mean CE per head: logits (L, B, C) -> (L,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[None, :, None], axis=-1)[..., 0]
    return -jnp.mean(picked, axis=-1)


def build_probe_train_step(params_trunk, cfg: VTPConfig, pcfg: ProbeConfig,
                           compute_dtype=jnp.bfloat16):
    """Returns jitted ``step(state, images, labels) -> (state, loss)``."""

    def loss_fn(heads, feats, labels):
        total = 0.0
        for n in pcfg.n_last_blocks_list:
            x = create_linear_input(feats, n)
            ce = _cross_entropy(_head_logits(heads[f"n{n}"], x), labels)
            total = total + jnp.sum(ce)  # reference sums all head losses
        return total

    def cosine_lr_scale(step):
        t = jnp.clip(step.astype(jnp.float32) / pcfg.max_iter, 0.0, 1.0)
        return 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    @jax.jit
    def step_fn(state, images, labels):
        feats = extract_features(
            params_trunk, cfg, images, pcfg.feature_blocks, compute_dtype
        )
        feats = jax.lax.stop_gradient(feats)
        loss, grads = jax.value_and_grad(loss_fn)(state["heads"], feats, labels)
        scale = cosine_lr_scale(state["step"])
        new_heads, new_mom = {}, {}
        for key, h in state["heads"].items():
            g = grads[key]
            m = state["momentum"][key]
            lr = (h["lr"] * scale)[:, None, None]
            mw = 0.9 * m["w"] + g["w"]
            mb = 0.9 * m["b"] + g["b"]
            new_heads[key] = {
                "w": h["w"] - lr * mw,
                "b": h["b"] - lr[..., 0] * mb,
                "lr": h["lr"],
            }
            new_mom[key] = {"w": mw, "b": mb}
        return {
            "heads": new_heads,
            "momentum": new_mom,
            "step": state["step"] + 1,
        }, loss

    return step_fn


def build_probe_eval_step(params_trunk, cfg: VTPConfig, pcfg: ProbeConfig,
                          compute_dtype=jnp.bfloat16):
    @jax.jit
    def eval_fn(heads, images, labels):
        feats = extract_features(
            params_trunk, cfg, images, pcfg.feature_blocks, compute_dtype
        )
        counts = {}
        for n in pcfg.n_last_blocks_list:
            x = create_linear_input(feats, n)
            logits = _head_logits(heads[f"n{n}"], x)  # (L, B, C)
            pred = jnp.argmax(logits, axis=-1)
            counts[f"n{n}"] = jnp.sum(pred == labels[None, :], axis=-1)  # (L,)
        return counts

    return eval_fn


def head_names(pcfg: ProbeConfig, global_batch: int) -> Dict[str, Tuple[str, int]]:
    """classifier key (matching the reference naming scheme) ->
    (group, index-in-group)."""
    names = {}
    for n in pcfg.n_last_blocks_list:
        for i, base in enumerate(pcfg.learning_rates):
            lr = base * global_batch / 256.0
            key = f"classifier_{n}_blocks_avgpool_True_lr_{lr:.5f}".replace(".", "_")
            names[key] = (f"n{n}", i)
    return names


def evaluate_linear_probe(
    trunk_params,
    cfg: VTPConfig,
    state: Dict,
    val_loader,
    pcfg: ProbeConfig,
    compute_dtype=jnp.bfloat16,
    progress: bool = False,
) -> Dict[str, float]:
    """Accuracy per head over a validation loader
    (test_linear_probing_hf.py:302-345)."""
    eval_fn = build_probe_eval_step(trunk_params, cfg, pcfg, compute_dtype)
    totals = {f"n{n}": np.zeros(len(pcfg.learning_rates)) for n in pcfg.n_last_blocks_list}
    n_total = 0
    it = val_loader
    if progress:
        from tqdm import tqdm  # type: ignore

        it = tqdm(val_loader, desc="probe eval")
    for images, labels in it:
        counts = eval_fn(state["heads"], jnp.asarray(images), jnp.asarray(labels))
        for k, v in counts.items():
            totals[k] += np.asarray(v)
        n_total += len(labels)
    accs = {}
    for key, (group, idx) in head_names(pcfg, pcfg.batch_size).items():
        accs[key] = 100.0 * float(totals[group][idx]) / max(n_total, 1)
    return accs
