from vtp_tpu.dit.model import DiTConfig, dit_forward, init_dit_params, DIT_PRESETS
from vtp_tpu.dit.transport import (
    sample_timesteps,
    training_losses,
    euler_sample,
)
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

__all__ = [
    "DiTConfig",
    "dit_forward",
    "init_dit_params",
    "DIT_PRESETS",
    "sample_timesteps",
    "training_losses",
    "euler_sample",
    "DiTTrainConfig",
    "build_dit_train_step",
    "init_dit_state",
]
