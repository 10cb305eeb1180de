from vtp_tpu.train.losses import (
    clip_loss,
    siglip_loss,
    dino_loss,
    ibot_loss,
    reconstruction_loss,
    update_center,
)
from vtp_tpu.train.schedules import CosineScheduler, cosine_schedule
from vtp_tpu.train.state import TrainState, create_train_state, ema_update
from vtp_tpu.train.step import TrainConfig, build_train_step, make_ssl_batch

__all__ = [
    "clip_loss",
    "siglip_loss",
    "dino_loss",
    "ibot_loss",
    "reconstruction_loss",
    "update_center",
    "CosineScheduler",
    "cosine_schedule",
    "TrainState",
    "create_train_state",
    "ema_update",
    "TrainConfig",
    "build_train_step",
    "make_ssl_batch",
]
