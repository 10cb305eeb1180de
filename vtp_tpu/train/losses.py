"""Training objectives for the VTP meta-architecture.

The reference releases the meta-arch (``vtp/models/vtp.py``: CLIP +
DINOv2-style SSL + reconstruction forward modes) but not the training
loop itself (SURVEY.md section 1.7 — the trainer lives in an external
submodule). The objectives here are the standard published forms those
forward modes exist to serve: CLIP/SigLIP contrastive, DINO
(teacher-centering cross-entropy), iBOT masked-patch, and pixel
reconstruction.

All losses are pure functions, safe under pjit: cross-device terms
(contrastive logits over the global batch) rely on the global-view
arrays jit provides, so no explicit collectives are needed.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
) -> jax.Array:
    """Symmetric InfoNCE over the (global) batch; features L2-normalized."""
    logits = jnp.exp(logit_scale) * image_features @ text_features.T
    labels = jnp.arange(logits.shape[0])
    li = -jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], -1).mean()
    lt = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, -1), labels[:, None], -1).mean()
    return 0.5 * (li + lt)


def siglip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    logit_bias: jax.Array,
) -> jax.Array:
    """Pairwise sigmoid loss (SigLIP) — used when the config carries
    ``init_logit_bias`` (configuration_vtp.py:112)."""
    logits = jnp.exp(logit_scale) * image_features @ text_features.T + logit_bias
    n = logits.shape[0]
    labels = 2.0 * jnp.eye(n) - 1.0  # +1 diag, -1 off-diag
    return -jnp.mean(jax.nn.log_sigmoid(labels * logits)) * n


def dino_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    center: jax.Array,
    *,
    student_temp: float = 0.1,
    teacher_temp: float = 0.07,
) -> jax.Array:
    """DINO cross-entropy: centered+sharpened teacher targets vs
    student log-softmax. teacher side is stop-gradient by construction
    (teacher params are EMA copies)."""
    from vtp_tpu.ops.fused_ce import fused_ce_rows_auto, fused_ce_supported

    if fused_ce_supported(teacher_logits, student_logits):
        per_row = fused_ce_rows_auto(teacher_logits, student_logits,
                                center.astype(jnp.float32),
                                teacher_temp, student_temp)
        return per_row.mean()
    t = jax.nn.softmax((teacher_logits.astype(jnp.float32) - center) / teacher_temp,
                       axis=-1)
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / student_temp, axis=-1)
    return -jnp.mean(jnp.sum(t * s, axis=-1))


def ibot_loss(
    student_patch_logits: jax.Array,
    teacher_patch_logits: jax.Array,
    center: jax.Array,
    mask_weight: Optional[jax.Array] = None,
    *,
    student_temp: float = 0.1,
    teacher_temp: float = 0.07,
) -> jax.Array:
    """Masked-patch DINO loss on the iBOT buffer (vtp.py:428-448 wires
    the masked tokens; the ``upperbound`` static buffer maps directly to
    XLA's static shapes — padded rows get zero weight)."""
    from vtp_tpu.ops.fused_ce import fused_ce_rows_auto, fused_ce_supported

    if fused_ce_supported(teacher_patch_logits, student_patch_logits):
        per_token = fused_ce_rows_auto(teacher_patch_logits, student_patch_logits,
                                  center.astype(jnp.float32),
                                  teacher_temp, student_temp)
    else:
        t = jax.nn.softmax((teacher_patch_logits.astype(jnp.float32) - center)
                           / teacher_temp, axis=-1)
        s = jax.nn.log_softmax(student_patch_logits.astype(jnp.float32)
                               / student_temp, axis=-1)
        per_token = -jnp.sum(t * s, axis=-1)
    if mask_weight is None:
        return per_token.mean()
    denom = jnp.maximum(mask_weight.sum(), 1.0)
    return (per_token * mask_weight).sum() / denom


def update_center(
    center: jax.Array,
    teacher_logits: jax.Array,
    momentum: float = 0.9,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """EMA center update over the global batch of teacher logits.

    ``weight`` masks padded rows: the iBOT buffer is padded to the
    static ``upperbound`` with index-0 duplicates (vtp.py:432-439), so
    an unweighted mean would bias the center toward token 0's logits.
    """
    tl = teacher_logits.astype(jnp.float32)
    if weight is None:
        batch_center = jnp.mean(tl, axis=0)
    else:
        w = weight.astype(jnp.float32)
        batch_center = (tl * w[:, None]).sum(axis=0) / jnp.maximum(w.sum(), 1.0)
    return momentum * center + (1.0 - momentum) * batch_center


def reconstruction_loss(
    reconstructed: jax.Array,
    target: jax.Array,
    *,
    loss_type: str = "mse",
) -> jax.Array:
    diff = reconstructed.astype(jnp.float32) - target.astype(jnp.float32)
    if loss_type == "mse":
        return jnp.mean(diff * diff)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_type == "smooth_l1":
        a = jnp.abs(diff)
        return jnp.mean(jnp.where(a < 1.0, 0.5 * diff * diff, a - 0.5))
    raise ValueError(loss_type)


def koleo_loss(features: jax.Array, eps: float = 1e-8) -> jax.Array:
    """KoLeo regularizer (DINOv2): -mean log nearest-neighbor distance
    of L2-normalized cls features within the batch."""
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), eps)
    sim = f @ f.T
    sim = sim - 2.0 * jnp.eye(f.shape[0])  # exclude self
    nn_sim = jnp.max(sim, axis=-1)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * nn_sim, eps))
    return -jnp.mean(jnp.log(dist + eps))
