"""The VTP training step: CLIP + DINOv2-style SSL + reconstruction.

Rebuilds the reference's training meta-architecture (vtp.py:88-552)
as one pure, pjit-able step:

  * CLIP mode   (vtp.py:340-360): image/text towers -> contrastive loss;
  * SSL mode    (vtp.py:365-484): EMA teacher on global crops, student
    on masked globals + local crops (multi-crop list forward), DINO
    head, DINO + iBOT objectives with centered teachers;
  * Rec mode    (vtp.py:487-512): bottleneck latents -> pixel decoder
    -> pixel loss.

The reference's ``upperbound`` static iBOT buffers (vtp.py:432-439) map
directly to XLA static shapes: masked-patch indices are padded to a
fixed length with zero weights. The DDP drop-path broadcast dance
(block.py:20-118) is replaced by deterministic per-shard keep counts
from the shared PRNG key (models/blocks.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.dino_head import DinoHeadConfig, dino_head_forward, init_dino_head_params
from vtp_tpu.models.pixel_decoder import pixel_decoder_forward
from vtp_tpu.models.text_encoder import text_encode
from vtp_tpu.models.vit import vit_forward_features
from vtp_tpu.models.vtp_model import (
    decoder_config_from,
    init_vtp_params,
    l2_normalize,
    text_config_from,
    vit_config_from,
)
from vtp_tpu.ops.ffn import linear
from vtp_tpu.ops.patchify import patch_tokens_to_4d
from vtp_tpu.train.losses import (
    clip_loss,
    dino_loss,
    ibot_loss,
    koleo_loss,
    reconstruction_loss,
    siglip_loss,
    update_center,
)
from vtp_tpu.train.optim import adamw, resolve_moment_dtype
from vtp_tpu.train.state import TrainState, create_train_state, ema_update, make_teacher


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # objectives (training.train_* flags in the reference configs)
    train_clip: bool = True
    train_ssl: bool = True
    train_reconstruction: bool = True
    clip_weight: float = 1.0
    dino_weight: float = 1.0
    ibot_weight: float = 1.0
    koleo_weight: float = 0.1
    rec_weight: float = 1.0
    rec_loss_type: str = "mse"
    # per-objective stochastic-depth rates (vtp.py:206-208)
    clip_drop_rate: float = 0.0
    ssl_drop_rate: float = 0.0
    rec_drop_rate: float = 0.0
    # SSL
    dino_out_dim: int = 65536
    dino_hidden_dim: int = 2048
    dino_bottleneck_dim: int = 256
    dino_nlayers: int = 3
    student_temp: float = 0.1
    teacher_temp: float = 0.07
    center_momentum: float = 0.9
    teacher_momentum: float = 0.994
    n_global_crops: int = 2
    # optimizer
    learning_rate: float = 1e-3
    weight_decay: float = 0.04
    beta1: float = 0.9
    beta2: float = 0.95
    warmup_steps: int = 1000
    total_steps: int = 100_000
    grad_clip: float = 1.0
    # zero-Jacobian L2-normalize on exactly-zero student head rows
    # (drop-path x mask_token pathology; see dino_head_forward). Values
    # are identical to the torch-faithful clamp — only the gradient at
    # the measure-zero point differs. Off = torch-faithful everywhere.
    zero_safe_normalize: bool = True
    # precision
    compute_dtype: Optional[str] = "bf16"
    # memory: rematerialize blocks in backward (jax.checkpoint).
    # False = save all, True/"full" = save nothing, "dots" = save matmul
    # outputs and recompute elementwise only (blocks.remat_wrap).
    remat: Union[bool, str] = True
    # unroll the block depth loop in train forwards (faster backward on
    # v5e: the scan transpose's stacked-grad DUS accumulation costs
    # 20-25%; compile time grows with depth). True = full unroll; an int
    # k scans depth/k segments of k Python-unrolled layers (most of the
    # backward win at a fraction of the compile cost — PERF.md round 3)
    unroll_layers: Union[bool, int] = False
    # parallelism (drop-path shard count, = data-axis size)
    drop_shards: int = 1
    # Megatron sequence parallelism (arXiv:2205.05198 §4.2.2): shard the
    # residual token rows over the model axis between the column/row-
    # parallel GEMM pairs — same collective bytes (all-reduce becomes
    # reduce-scatter + all-gather), 1/tp the elementwise compute and
    # saved-activation memory per chip. No-op without a model axis > 1.
    sequence_parallel: bool = False
    # GPipe pipeline parallelism (parallel/pipeline.py): stage-shard the
    # transformer depth over a `pipe` mesh axis of this size. The value
    # is the mesh-construction knob (tools/train_vtp.py builds a
    # (data, pipe) mesh from it); DISPATCH rides the ambient mesh — any
    # scan_blocks depth loop under jax.set_mesh of a pipe mesh pipelines
    # automatically when depth/batch divide (models/blocks.scan_blocks →
    # parallel/pipeline.maybe_pipeline_blocks), and falls back to the
    # sequential scan per tower otherwise.
    pipeline_stages: int = 1
    # head-major TP qkv layout factor (must equal the mesh's model-axis
    # size; vision_num_heads % it == 0): init permutes the trunk's qkv
    # parameters into rank-major [Q_r|K_r|V_r] column groups
    # (parallel.sharding.qkv_head_major) so each model shard's qkv GEMM
    # output is a canonical packed qkv for its heads and the fused
    # Pallas attention kernels (fwd + bwd) engage per-shard under
    # tensor parallelism instead of falling back to XLA (+47% step
    # time, PERF.md round 5). Math is mesh-independent; checkpoints
    # saved with this layout must be restored with the same value (or
    # canonicalized via permute_trunk_qkv(inverse=True) for export).
    tp_head_major: int = 1
    # gradient accumulation: when > 1, every batch leaf must carry a
    # leading (accum_steps,) microbatch axis (tree-stack accum_steps
    # microbatches); grads are averaged across microbatches before one
    # optimizer/EMA update, and the DINO/iBOT centers update as if over
    # the concatenated batch. Contrastive objectives (CLIP/koleo) see
    # each microbatch independently — the standard accumulation
    # semantics (negatives don't cross microbatches).
    accum_steps: int = 1
    # Adam moment storage dtype: "fp32" (bit-exact optax/torch AdamW)
    # or "bf16" (halves optimizer HBM traffic + one fp32 param copy of
    # state memory; sub-percent update noise — train/optim.py)
    moment_dtype: str = "fp32"
    # gradient-accumulator storage dtype for the HOST-DRIVEN microbatch
    # path (run_host_accum_step); the in-jit scan path always carries
    # fp32. "bf16" halves the accumulator's HBM footprint — the lever
    # that lets VTP-L fit small-microbatch accumulation (cf. DiT-XL,
    # dit/train.py accum_dtype)
    accum_dtype: str = "fp32"

    @property
    def jnp_compute_dtype(self):
        return {None: None, "bf16": jnp.bfloat16, "fp32": None}[self.compute_dtype]


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    warmup = min(tcfg.warmup_steps, max(tcfg.total_steps - 1, 0))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tcfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(tcfg.total_steps, warmup + 1),
        end_value=0.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        adamw(
            schedule, b1=tcfg.beta1, b2=tcfg.beta2,
            weight_decay=tcfg.weight_decay,
            moment_dtype=resolve_moment_dtype(tcfg.moment_dtype),
        ),
    )


def init_train_params(key: jax.Array, cfg: VTPConfig, tcfg: TrainConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = init_vtp_params(k1, cfg)
    if tcfg.tp_head_major > 1 and cfg.vision_qkv_head_major == 1:
        # the model config is canonical and the TRAIN config asks for
        # the head-major TP layout: permute here (init_vtp_params
        # already permuted if the config itself declared the layout)
        from vtp_tpu.parallel.sharding import permute_trunk_qkv

        params["trunk"] = permute_trunk_qkv(
            params["trunk"], cfg.vision_num_heads, tcfg.tp_head_major)
    if tcfg.train_ssl:
        in_dim = (
            cfg.vision_embed_dim if cfg.vision_bottleneck_ae_only
            else cfg.vision_feature_bottleneck
        )
        params["dino_head"] = init_dino_head_params(
            k2,
            DinoHeadConfig(
                in_dim=in_dim,
                out_dim=tcfg.dino_out_dim,
                nlayers=tcfg.dino_nlayers,
                hidden_dim=tcfg.dino_hidden_dim,
                bottleneck_dim=tcfg.dino_bottleneck_dim,
            ),
        )
    return params


def init_state(key: jax.Array, cfg: VTPConfig, tcfg: TrainConfig) -> TrainState:
    params = init_train_params(key, cfg, tcfg)
    opt_state = make_optimizer(tcfg).init(params)
    return create_train_state(
        params, opt_state, dino_out_dim=tcfg.dino_out_dim, enable_teacher=tcfg.train_ssl
    )


def make_ssl_batch(
    key: jax.Array,
    batch: int,
    *,
    global_size: int = 256,
    local_size: int = 96,
    n_local: int = 4,
    patch: int = 16,
    mask_ratio: float = 0.3,
    upperbound_ratio: float = 0.5,
) -> Dict[str, jax.Array]:
    """Synthetic multi-crop SSL batch with iBOT mask bookkeeping in the
    reference's static-``upperbound`` layout (vtp.py:365-383)."""
    kg, kl, km = jax.random.split(key, 3)
    n_patches = (global_size // patch) ** 2
    n_tokens = 2 * batch * n_patches
    upperbound = int(n_tokens * upperbound_ratio)
    n_masked = int(n_tokens * mask_ratio)
    global_crops = jax.random.normal(kg, (2 * batch, 3, global_size, global_size))
    local_crops = jax.random.normal(kl, (n_local * batch, 3, local_size, local_size))
    perm = jax.random.permutation(km, n_tokens)
    mask_indices = jnp.zeros((upperbound,), jnp.int32).at[:n_masked].set(perm[:n_masked])
    mask_weight = (jnp.arange(upperbound) < n_masked).astype(jnp.float32)
    masks = jnp.zeros((n_tokens,), bool).at[perm[:n_masked]].set(True)
    return {
        "global_crops": global_crops,
        "local_crops": local_crops,
        "masks": masks.reshape(2 * batch, n_patches),
        "mask_indices": mask_indices,
        "mask_weight": mask_weight,
    }


def _dino_head_cfg(cfg: VTPConfig, tcfg: TrainConfig) -> DinoHeadConfig:
    in_dim = (
        cfg.vision_embed_dim if cfg.vision_bottleneck_ae_only
        else cfg.vision_feature_bottleneck
    )
    return DinoHeadConfig(
        in_dim=in_dim,
        out_dim=tcfg.dino_out_dim,
        nlayers=tcfg.dino_nlayers,
        hidden_dim=tcfg.dino_hidden_dim,
        bottleneck_dim=tcfg.dino_bottleneck_dim,
    )


def build_train_step(cfg: VTPConfig, tcfg: TrainConfig):
    """Returns ``train_step(state, batch, key) -> (state, metrics)``.

    batch keys (all optional by objective):
      image (B,3,H,W), text (B,L): CLIP pair
      rec_image (B,3,H,W): reconstruction target
      ssl: dict from make_ssl_batch-compatible pipeline
    """
    vcfg = vit_config_from(cfg)  # carries cfg.vision_qkv_head_major
    if tcfg.tp_head_major > 1:
        if cfg.vision_num_heads % tcfg.tp_head_major:
            raise ValueError(
                f"tp_head_major={tcfg.tp_head_major} must divide "
                f"vision_num_heads={cfg.vision_num_heads}")
        if cfg.vision_qkv_head_major not in (1, tcfg.tp_head_major):
            raise ValueError(
                f"tp_head_major={tcfg.tp_head_major} conflicts with the "
                f"model config's declared layout "
                f"vision_qkv_head_major={cfg.vision_qkv_head_major}")
        vcfg = dataclasses.replace(vcfg, qkv_head_major=tcfg.tp_head_major)
    dcfg = decoder_config_from(cfg)
    txtcfg = text_config_from(cfg)
    hcfg = _dino_head_cfg(cfg, tcfg)
    optimizer = make_optimizer(tcfg)
    cdt = tcfg.jnp_compute_dtype
    use_bn_for_ssl = not cfg.vision_bottleneck_ae_only

    def clip_branch(params, image, text, key):
        out = vit_forward_features(
            params["trunk"], vcfg, image,
            use_bottleneck=not cfg.vision_bottleneck_ae_only,
            compute_dtype=cdt, training=True,
            drop_ratio=tcfg.clip_drop_rate, key=key,
            drop_shards=tcfg.drop_shards, remat=tcfg.remat,
            unroll=tcfg.unroll_layers,
        )
        feat = (
            out["x_norm_clstoken"] if cfg.vision_clip_feat == "cls"
            else out["x_norm_patchtokens"].mean(axis=1)
        )
        img = l2_normalize(linear(feat, params["visual_proj"], cdt))
        t_out = text_encode(params["text"], txtcfg, text, compute_dtype=cdt,
                            remat=tcfg.remat, unroll=tcfg.unroll_layers)
        txt = l2_normalize(t_out[0] if isinstance(t_out, tuple) else t_out)
        if params.get("logit_bias") is not None:
            return siglip_loss(img, txt, params["logit_scale"], params["logit_bias"])
        return clip_loss(img, txt, params["logit_scale"])

    def rec_branch(params, image, key):
        _, _, H, W = image.shape
        out = vit_forward_features(
            params["trunk"], vcfg, image,
            use_bottleneck=True, compute_dtype=cdt, training=True,
            drop_ratio=tcfg.rec_drop_rate, key=key,
            drop_shards=tcfg.drop_shards, remat=tcfg.remat,
            unroll=tcfg.unroll_layers,
        )
        p = cfg.vision_patch_size
        latents = patch_tokens_to_4d(out["x_norm_patchtokens"], H // p, W // p)
        rec = pixel_decoder_forward(
            params["pixel_decoder"], dcfg, latents, compute_dtype=cdt,
            remat=tcfg.remat, unroll=tcfg.unroll_layers,
        )
        return reconstruction_loss(rec, image, loss_type=tcfg.rec_loss_type)

    def ssl_branch(params, teacher, centers, ssl, key):
        dino_center, ibot_center = centers
        g = ssl["global_crops"]
        n_crops = tcfg.n_global_crops
        bc = g.shape[0] // n_crops

        # ---- teacher (no grad, EMA params; vtp.py:410-450)
        t_out = vit_forward_features(
            teacher["trunk"], vcfg, g,
            use_bottleneck=use_bn_for_ssl, compute_dtype=cdt,
        )
        t_cls = t_out["x_norm_clstoken"]
        # swap crops: student crop i targets teacher of the other crop
        t_cls_swapped = jnp.concatenate([t_cls[bc:], t_cls[:bc]], axis=0)
        t_cls_head = dino_head_forward(teacher["dino_head"], hcfg, t_cls_swapped, compute_dtype=cdt)
        t_patch_flat = t_out["x_norm_patchtokens"].reshape(-1, t_out["x_norm_patchtokens"].shape[-1])
        t_masked = jnp.take(t_patch_flat, ssl["mask_indices"], axis=0)
        t_masked_head = dino_head_forward(teacher["dino_head"], hcfg, t_masked, compute_dtype=cdt)
        t_cls_head = jax.lax.stop_gradient(t_cls_head)
        t_masked_head = jax.lax.stop_gradient(t_masked_head)

        # ---- student (masked globals + locals; vtp.py:452-484)
        s_global, s_local = vit_forward_features(
            params["trunk"], vcfg,
            [g, ssl["local_crops"]],
            masks=[ssl["masks"], None],
            use_bottleneck=use_bn_for_ssl, compute_dtype=cdt,
            training=True, drop_ratio=tcfg.ssl_drop_rate, key=key,
            drop_shards=tcfg.drop_shards, remat=tcfg.remat,
            unroll=tcfg.unroll_layers,
        )
        s_g_cls = s_global["x_norm_clstoken"]
        s_l_cls = s_local["x_norm_clstoken"]
        # student heads use the zero-safe normalize: with ssl_drop_rate>0
        # a fully-dropped sample's masked tokens equal the zero-init
        # mask_token, and the torch-faithful eps-clamped normalize has a
        # ~1/eps=1e12 Jacobian on those exactly-zero rows — one such row
        # blows the global grad norm to ~1e11 and the clipped update to a
        # near-no-op (values are identical; see dino_head_forward)
        head = lambda x: dino_head_forward(
            params["dino_head"], hcfg, x, compute_dtype=cdt,
            zero_safe_normalize=tcfg.zero_safe_normalize,
        )
        s_g_head = head(s_g_cls)
        s_l_head = head(s_l_cls)
        s_patch_flat = s_global["x_norm_patchtokens"].reshape(-1, s_g_cls.shape[-1])
        s_masked = jnp.take(s_patch_flat, ssl["mask_indices"], axis=0)
        s_masked_head = head(s_masked)

        l_dino_g = dino_loss(
            s_g_head, t_cls_head, dino_center,
            student_temp=tcfg.student_temp, teacher_temp=tcfg.teacher_temp,
        )
        # locals target the mean teacher distribution over global crops
        n_local = s_l_head.shape[0] // bc
        t_for_local = jnp.tile(t_cls_head[:bc], (n_local, 1))
        l_dino_l = dino_loss(
            s_l_head, t_for_local, dino_center,
            student_temp=tcfg.student_temp, teacher_temp=tcfg.teacher_temp,
        )
        l_ibot = ibot_loss(
            s_masked_head, t_masked_head, ibot_center, ssl["mask_weight"],
            student_temp=tcfg.student_temp, teacher_temp=tcfg.teacher_temp,
        )
        l_koleo = koleo_loss(s_g_cls)
        aux = (t_cls_head, t_masked_head)
        return l_dino_g + l_dino_l, l_ibot, l_koleo, aux

    def _loss_and_grads(state: TrainState, batch: Dict[str, Any], key: jax.Array):
        k_clip, k_rec, k_ssl = jax.random.split(key, 3)

        def loss_fn(params):
            metrics = {}
            total = 0.0
            aux = None
            if tcfg.train_clip and "image" in batch:
                l = clip_branch(params, batch["image"], batch["text"], k_clip)
                metrics["loss/clip"] = l
                total += tcfg.clip_weight * l
            if tcfg.train_reconstruction and "rec_image" in batch:
                l = rec_branch(params, batch["rec_image"], k_rec)
                metrics["loss/rec"] = l
                total += tcfg.rec_weight * l
            if tcfg.train_ssl and "ssl" in batch:
                l_dino, l_ibot, l_koleo, aux = ssl_branch(
                    params, state["teacher"],
                    (state["dino_center"], state["ibot_center"]),
                    batch["ssl"], k_ssl,
                )
                metrics["loss/dino"] = l_dino
                metrics["loss/ibot"] = l_ibot
                metrics["loss/koleo"] = l_koleo
                total += (
                    tcfg.dino_weight * l_dino
                    + tcfg.ibot_weight * l_ibot
                    + tcfg.koleo_weight * l_koleo
                )
            metrics["loss/total"] = total
            return total, (metrics, aux)

        from vtp_tpu.parallel.sharding import sequence_parallel

        with sequence_parallel(tcfg.sequence_parallel):
            (_, (metrics, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
        return grads, metrics, aux

    def _center_stats(aux, ssl_batch):
        """Streaming sufficient statistics for the center EMA updates:
        (sum of teacher cls logits, row count, weighted sum of teacher
        masked logits, weight sum)."""
        t_cls_head, t_masked_head = aux
        w = ssl_batch["mask_weight"].astype(jnp.float32)
        return (
            t_cls_head.astype(jnp.float32).sum(axis=0),
            jnp.asarray(float(t_cls_head.shape[0]), jnp.float32),
            (t_masked_head.astype(jnp.float32) * w[:, None]).sum(axis=0),
            w.sum(),
        )

    def _apply_updates(state, grads, metrics, aux, ssl_batch):
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = dict(state)
        new_state["params"] = params
        new_state["opt_state"] = opt_state
        new_state["step"] = state["step"] + 1
        if "teacher" in state:
            new_state["teacher"] = ema_update(
                state["teacher"], make_teacher(params), tcfg.teacher_momentum
            )
            if aux is not None:
                t_cls_head, t_masked_head = aux
                new_state["dino_center"] = update_center(
                    state["dino_center"], t_cls_head, tcfg.center_momentum
                )
                new_state["ibot_center"] = update_center(
                    state["ibot_center"], t_masked_head, tcfg.center_momentum,
                    weight=ssl_batch["mask_weight"],
                )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def train_step(state: TrainState, batch: Dict[str, Any], key: jax.Array):
        if tcfg.accum_steps <= 1:
            grads, metrics, aux = _loss_and_grads(state, batch, key)
            return _apply_updates(state, grads, metrics, aux,
                                  batch.get("ssl"))

        # gradient accumulation: batch leaves carry a leading
        # (accum_steps,) microbatch axis. The first microbatch runs
        # outside the scan to seed the carry structure; grads accumulate
        # in fp32 and are averaged before ONE optimizer/EMA step; the
        # center updates use statistics pooled over all microbatches —
        # bit-for-bit what a single concatenated batch would produce.
        accum = tcfg.accum_steps
        keys = jax.random.split(key, accum)
        micro0 = jax.tree.map(lambda x: x[0], batch)
        g0, m0, aux0 = _loss_and_grads(state, micro0, keys[0])
        g_sum = jax.tree.map(lambda g: g.astype(jnp.float32), g0)
        c_sum = _center_stats(aux0, micro0["ssl"]) if aux0 is not None else None

        def body(carry, xs):
            micro, k = xs
            g_sum, m_sum, c_sum = carry
            g, m, aux = _loss_and_grads(state, micro, k)
            g_sum = jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), g_sum, g
            )
            m_sum = jax.tree.map(jnp.add, m_sum, m)
            if c_sum is not None:
                c_sum = jax.tree.map(
                    jnp.add, c_sum, _center_stats(aux, micro["ssl"])
                )
            return (g_sum, m_sum, c_sum), None

        rest = jax.tree.map(lambda x: x[1:], batch)
        (g_sum, m_sum, c_sum), _ = jax.lax.scan(
            body, (g_sum, m0, c_sum), (rest, keys[1:])
        )
        return _apply_accumulated(state, g_sum, m_sum, c_sum, accum)

    def _apply_accumulated(state, g_sum, m_sum, c_sum, accum):
        """Shared accumulation epilogue (in-jit scan AND host-driven
        paths): average grads/metrics over microbatches, one optimizer +
        EMA step, center EMA from the pooled sufficient statistics —
        bit-for-bit what a single concatenated batch would produce."""
        grads = jax.tree.map(lambda g: g.astype(jnp.float32) / accum, g_sum)
        metrics = jax.tree.map(lambda m: m / accum, m_sum)

        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = dict(state)
        new_state["params"] = params
        new_state["opt_state"] = opt_state
        new_state["step"] = state["step"] + 1
        if "teacher" in state:
            new_state["teacher"] = ema_update(
                state["teacher"], make_teacher(params), tcfg.teacher_momentum
            )
            if c_sum is not None:
                cls_sum, cls_n, masked_sum, w_sum = c_sum
                m_c = tcfg.center_momentum
                new_state["dino_center"] = (
                    m_c * state["dino_center"]
                    + (1.0 - m_c) * cls_sum / jnp.maximum(cls_n, 1.0)
                )
                new_state["ibot_center"] = (
                    m_c * state["ibot_center"]
                    + (1.0 - m_c) * masked_sum / jnp.maximum(w_sum, 1.0)
                )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def micro_step(state, g_sum, m_sum, c_sum, micro, key):
        """Host-driven accumulation (the DiT machinery's twin,
        dit/train.py:173-207): one microbatch's grads/metrics/center
        stats added into donated accumulators. Use when the in-jit
        accumulation scan's HLO exceeds XLA's HBM plan (VTP-L). Adds in
        fp32, stores in ``tcfg.accum_dtype``."""
        adt = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[tcfg.accum_dtype]
        g, m, aux = _loss_and_grads(state, micro, key)
        g_sum = jax.tree.map(
            lambda a, b: (a.astype(jnp.float32)
                          + b.astype(jnp.float32)).astype(adt), g_sum, g)
        m_sum = jax.tree.map(jnp.add, m_sum, m)
        if aux is not None:
            c = _center_stats(aux, micro["ssl"])
            c_sum = jax.tree.map(jnp.add, c_sum, c)
        return g_sum, m_sum, c_sum

    def apply_accum(state, g_sum, m_sum, c_sum):
        return _apply_accumulated(
            state, g_sum, m_sum, c_sum, max(1, tcfg.accum_steps)
        )

    def zero_accumulators(state, micro0):
        """Fresh (g_sum, m_sum, c_sum) for the host-driven microbatch
        loop; ``micro0`` is ONE microbatch (no accum axis). Metric keys
        are enumerated statically from the same (tcfg flag, batch key)
        conditions as ``loss_fn`` — an ``eval_shape`` over
        ``_loss_and_grads`` here would re-trace the whole unrolled
        backward in Python on EVERY optimizer step (measured 44.5 s/step
        at VTP-L B=16 no-remat; the round-4 accumulation ladder's
        pathology)."""
        adt = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[tcfg.accum_dtype]
        g_sum = jax.tree.map(
            lambda p: jnp.zeros(p.shape, adt), state["params"]
        )
        m_keys = []
        if tcfg.train_clip and "image" in micro0:
            m_keys.append("loss/clip")
        if tcfg.train_reconstruction and "rec_image" in micro0:
            m_keys.append("loss/rec")
        if tcfg.train_ssl and "ssl" in micro0:
            m_keys += ["loss/dino", "loss/ibot", "loss/koleo"]
        m_keys.append("loss/total")
        m_sum = {k: jnp.zeros((), jnp.float32) for k in m_keys}
        c_sum = None
        if tcfg.train_ssl and "ssl" in micro0:
            d = tcfg.dino_out_dim
            c_sum = (
                jnp.zeros((d,), jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((d,), jnp.float32), jnp.zeros((), jnp.float32),
            )
        return g_sum, m_sum, c_sum

    def objective_grad_norms(state: TrainState, batch: Dict[str, Any], key: jax.Array):
        """Per-objective global grad norms (one backward pass per
        objective — a debug/dryrun diagnostic, not a hot-path metric).
        Surfaces pathologies the combined ``grad_norm`` hides, e.g. the
        iBOT x drop-path zero-row normalize spike (PERF.md round 3)."""
        k_clip, k_rec, k_ssl = jax.random.split(key, 3)
        p = state["params"]
        norms = {}
        if tcfg.train_clip and "image" in batch:
            g = jax.grad(
                lambda q: clip_branch(q, batch["image"], batch["text"], k_clip)
            )(p)
            norms["grad_norm/clip"] = optax.global_norm(g)
        if tcfg.train_reconstruction and "rec_image" in batch:
            g = jax.grad(lambda q: rec_branch(q, batch["rec_image"], k_rec))(p)
            norms["grad_norm/rec"] = optax.global_norm(g)
        if tcfg.train_ssl and "ssl" in batch:
            def part(i):
                def f(q):
                    l_dino, l_ibot, l_koleo, _ = ssl_branch(
                        q, state["teacher"],
                        (state["dino_center"], state["ibot_center"]),
                        batch["ssl"], k_ssl,
                    )
                    return (l_dino, l_ibot, l_koleo)[i]
                return optax.global_norm(jax.grad(f)(p))

            norms["grad_norm/dino"] = part(0)
            norms["grad_norm/ibot"] = part(1)
            norms["grad_norm/koleo"] = part(2)
        return norms

    train_step.objective_grad_norms = objective_grad_norms
    train_step.micro_step = micro_step
    train_step.apply_accum = apply_accum
    train_step.zero_accumulators = zero_accumulators
    return train_step


def run_host_accum_step(train_step, tcfg: TrainConfig, state, batch, key,
                        micro_jit=None, apply_jit=None, stacked=True):
    """Drive ONE optimizer step of host accumulation: every batch leaf
    carries a leading (accum_steps,) microbatch axis (the in-jit scan
    path's contract); the key splits per microbatch identically, so the
    result matches ``train_step`` with the same batch up to accumulator
    rounding. Pass pre-jitted ``micro_jit``/``apply_jit`` (with donation
    on the accumulators) to amortize; otherwise the attributes are
    jitted here per call.

    ``stacked=False`` feeds ``batch`` (a single microbatch, NO leading
    accum axis) to every micro step instead of slicing. Synthetic-bench
    mode: materializing the full global batch on one chip costs ~1.1 GB
    of HBM at VTP-L/global-256 (images + rec targets + SSL crops), which
    is exactly what tipped the SSL ladder into RESOURCE_EXHAUSTED
    (traces/r5_vtpl_ssl_ladder.json); per-microbatch keys still differ so
    the tunnel's dedup cache never collapses the dispatches."""
    accum = max(1, tcfg.accum_steps)
    micro_fn = micro_jit or jax.jit(train_step.micro_step,
                                    donate_argnums=(1, 2, 3))
    apply_fn = apply_jit or jax.jit(train_step.apply_accum,
                                    donate_argnums=(1, 2, 3))
    keys = jax.random.split(key, accum)
    micro0 = jax.tree.map(lambda x: x[0], batch) if stacked else batch
    g_sum, m_sum, c_sum = train_step.zero_accumulators(state, micro0)
    for i in range(accum):
        micro = jax.tree.map(lambda x: x[i], batch) if stacked else batch
        g_sum, m_sum, c_sum = micro_fn(state, g_sum, m_sum, c_sum,
                                       micro, keys[i])
    return apply_fn(state, g_sum, m_sum, c_sum)
