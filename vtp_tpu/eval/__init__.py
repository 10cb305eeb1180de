from vtp_tpu.eval.zero_shot import (
    build_zero_shot_classifier,
    evaluate_zero_shot,
    load_imagenet_classnames,
    load_openai_templates,
)
from vtp_tpu.eval.reconstruction import evaluate_reconstruction
from vtp_tpu.eval.linear_probe import evaluate_linear_probe

__all__ = [
    "build_zero_shot_classifier",
    "evaluate_zero_shot",
    "load_imagenet_classnames",
    "load_openai_templates",
    "evaluate_reconstruction",
    "evaluate_linear_probe",
]
