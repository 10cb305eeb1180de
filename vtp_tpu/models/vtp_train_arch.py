"""Legacy VTP training meta-architecture facade.

Behavioral reference: ``vtp/models/vtp.py:88-552`` — the class that
bundles trunk + proj + dino_head + pixel_decoder + text tower with
frozen EMA teacher copies and exposes the three forward modes
(clip / ssl / rec) plus ``update_teacher``.

This is a thin object-oriented facade over the pure functions in
``vtp_tpu.train.step`` and the tower forwards, for users of the
reference's training API. New training code should use
``vtp_tpu.train.build_train_step`` directly (single jitted step,
sharding-ready).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vtp_tpu.config import VTPConfig
from vtp_tpu.models.dino_head import dino_head_forward
from vtp_tpu.models.pixel_decoder import pixel_decoder_forward
from vtp_tpu.models.text_encoder import text_encode
from vtp_tpu.models.vit import vit_forward_features
from vtp_tpu.models.vtp_model import (
    decoder_config_from,
    l2_normalize,
    text_config_from,
    vit_config_from,
)
from vtp_tpu.ops.ffn import linear
from vtp_tpu.ops.patchify import patch_tokens_to_4d
from vtp_tpu.train.state import ema_update, make_teacher
from vtp_tpu.train.step import TrainConfig, _dino_head_cfg, init_train_params


class VTP:
    """Object facade matching the reference VTP class's public methods."""

    def __init__(
        self,
        config: VTPConfig,
        train_config: Optional[TrainConfig] = None,
        params: Optional[dict] = None,
        key: Optional[jax.Array] = None,
        compute_dtype=jnp.bfloat16,
    ):
        self.config = config
        self.train_config = train_config or TrainConfig()
        self.compute_dtype = compute_dtype
        self._vcfg = vit_config_from(config)
        self._dcfg = decoder_config_from(config)
        self._tcfg = text_config_from(config)
        self._hcfg = _dino_head_cfg(config, self.train_config)
        if params is None:
            params = init_train_params(
                key if key is not None else jax.random.key(0),
                config, self.train_config,
            )
        self.params = params
        self.enable_teacher = self.train_config.train_ssl and "dino_head" in params
        self.teacher = make_teacher(params) if self.enable_teacher else None
        # per-objective drop rates (vtp.py:206-208)
        self.clip_drop_rate = self.train_config.clip_drop_rate
        self.ssl_drop_rate = self.train_config.ssl_drop_rate
        self.rec_drop_rate = self.train_config.rec_drop_rate

    # ------------------------------------------------------------ CLIP

    def encode_image(self, image, normalize: bool = False, *,
                     training: bool = False, key=None):
        """(vtp.py:275-293)."""
        out = vit_forward_features(
            self.params["trunk"], self._vcfg, image,
            use_bottleneck=not self.config.vision_bottleneck_ae_only,
            compute_dtype=self.compute_dtype,
            training=training, drop_ratio=self.clip_drop_rate if training else 0.0,
            key=key,
        )
        if self.config.vision_clip_feat == "cls":
            feat = out["x_norm_clstoken"]
        else:
            feat = out["x_norm_patchtokens"].mean(axis=1)
        feat = linear(feat, self.params["visual_proj"], self.compute_dtype)
        return l2_normalize(feat) if normalize else feat

    def encode_text(self, text, normalize: bool = False):
        """(vtp.py:295-312) — pooled feature only, like the reference's
        meta-arch encode_text (which bypasses the tower's
        embed_cls/output_tokens forward)."""
        out = text_encode(
            self.params["text"], self._tcfg, text,
            normalize=normalize, compute_dtype=self.compute_dtype,
        )
        return out[0] if isinstance(out, tuple) else out

    def get_logits(self, image, text) -> Tuple[jax.Array, jax.Array]:
        """(vtp.py:314-321)."""
        img = self.encode_image(image, normalize=True)
        txt = self.encode_text(text, normalize=True)
        logits = jnp.exp(self.params["logit_scale"]) * img @ txt.T
        if self.params.get("logit_bias") is not None:
            logits = logits + self.params["logit_bias"]
        return logits, logits.T

    # ------------------------------------------------------------- SSL

    def get_teacher_forward_outputs(
        self, global_crops, n_global_crops, mask_indices, n_masked_weight,
    ) -> Dict[str, jax.Array]:
        """EMA-teacher targets with crop swap + masked-patch gather
        (vtp.py:410-450). ``mask_indices`` is the upperbound-padded
        static buffer; ``n_masked_weight`` its validity weights."""
        if not self.enable_teacher:
            return {}
        use_bn = not self.config.vision_bottleneck_ae_only
        out = vit_forward_features(
            self.teacher["trunk"], self._vcfg, global_crops,
            use_bottleneck=use_bn, compute_dtype=self.compute_dtype,
        )
        bc = global_crops.shape[0] // n_global_crops
        cls = out["x_norm_clstoken"]
        cls_swapped = jnp.concatenate([cls[bc:], cls[:bc]], axis=0)
        patch_flat = out["x_norm_patchtokens"].reshape(-1, cls.shape[-1])
        masked = jnp.take(patch_flat, mask_indices, axis=0)
        return {
            "teacher_cls_tokens_after_head": jax.lax.stop_gradient(
                dino_head_forward(self.teacher["dino_head"], self._hcfg, cls_swapped)
            ),
            "masked_teacher_patch_tokens_after_head": jax.lax.stop_gradient(
                dino_head_forward(self.teacher["dino_head"], self._hcfg, masked)
            ),
            "mask_weight": n_masked_weight,
        }

    def get_student_ssl_outputs(
        self, global_crops, local_crops, masks, mask_indices,
        *, training: bool = True, key=None,
    ) -> Dict[str, jax.Array]:
        """Masked-global + local multi-crop student pass (vtp.py:452-484)."""
        if not self.enable_teacher:
            return {}
        use_bn = not self.config.vision_bottleneck_ae_only
        s_global, s_local = vit_forward_features(
            self.params["trunk"], self._vcfg, [global_crops, local_crops],
            masks=[masks, None], use_bottleneck=use_bn,
            compute_dtype=self.compute_dtype, training=training,
            drop_ratio=self.ssl_drop_rate if training else 0.0, key=key,
        )
        g_cls = s_global["x_norm_clstoken"]
        l_cls = s_local["x_norm_clstoken"]
        patch_flat = s_global["x_norm_patchtokens"].reshape(-1, g_cls.shape[-1])
        masked = jnp.take(patch_flat, mask_indices, axis=0)
        head = lambda t: dino_head_forward(self.params["dino_head"], self._hcfg, t)
        return {
            "student_local_cls_tokens_after_head": head(l_cls),
            "student_global_cls_tokens_after_head": head(g_cls),
            "student_global_cls_tokens": g_cls,
            "student_global_masked_patch_tokens_after_head": head(masked),
        }

    # --------------------------------------------------------------- rec

    def get_reconstruction_outputs(self, image, *, training: bool = False, key=None):
        """(vtp.py:487-512)."""
        if not self.train_config.train_reconstruction:
            return {}
        _, _, H, W = image.shape
        out = vit_forward_features(
            self.params["trunk"], self._vcfg, image,
            use_bottleneck=True, compute_dtype=self.compute_dtype,
            training=training, drop_ratio=self.rec_drop_rate if training else 0.0,
            key=key,
        )
        p = self.config.vision_patch_size
        latents = patch_tokens_to_4d(out["x_norm_patchtokens"], H // p, W // p)
        rec = pixel_decoder_forward(
            self.params["pixel_decoder"], self._dcfg, latents,
            compute_dtype=self.compute_dtype,
        )
        return {"reconstructed_image": rec, "target_image": image}

    # ------------------------------------------------------------ control

    def forward(self, image=None, text=None, ssl_dict=None,
                reconstruction_image=None, forward_type: str = "clip"):
        """(vtp.py:323-338)."""
        if forward_type == "clip":
            out = {
                "image_features": self.encode_image(image, True) if image is not None else None,
                "text_features": self.encode_text(text, True) if text is not None else None,
                "logit_scale": jnp.exp(self.params["logit_scale"]),
            }
            if self.params.get("logit_bias") is not None:
                out["logit_bias"] = self.params["logit_bias"]
            return out
        if forward_type == "ssl":
            teacher = self.get_teacher_forward_outputs(
                ssl_dict["global_crops"], ssl_dict.get("n_global_crops", 2),
                ssl_dict["mask_indices"], ssl_dict["mask_weight"],
            )
            student = self.get_student_ssl_outputs(
                ssl_dict["global_crops"], ssl_dict["local_crops"],
                ssl_dict["masks"], ssl_dict["mask_indices"],
            )
            return teacher, student
        if forward_type == "rec":
            return self.get_reconstruction_outputs(reconstruction_image)
        raise ValueError(f"Invalid forward type: {forward_type}")

    __call__ = forward

    def update_teacher(self, momentum: float) -> None:
        """EMA lerp of trunk + proj + dino_head (vtp.py:388-401)."""
        if not self.enable_teacher:
            return
        self.teacher = ema_update(self.teacher, make_teacher(self.params), momentum)
