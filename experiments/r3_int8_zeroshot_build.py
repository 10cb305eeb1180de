"""Zero-shot classifier build: bf16 vs int8 W8A8 text tower (round 3).

The 80k-text classifier build (1000 ImageNet classes x 80 OpenAI
templates, eval/zero_shot.build_zero_shot_classifier) is the text
tower's production workload. The int8 path quantizes params["text"]
(utils/quantization); the causal flash attention kernel is unchanged —
only the qkv/proj/mlp GEMMs run int8 x int8 on the MXU.

Quality gate printed alongside: classifier-column cosine vs the bf16
build (random weights; the protocol metric is zero-shot top-1, which
needs real weights — zero egress).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import PRESETS
from vtp_tpu.eval.zero_shot import build_zero_shot_classifier
from vtp_tpu.models.vtp_model import init_vtp_params
from vtp_tpu.tokenizers.bpe import get_tokenizer
from vtp_tpu.utils.params import cast_matmul_params
from vtp_tpu.utils.quantization import quantize_matmul_params


def main():
    print("devices:", jax.devices())
    cfg = PRESETS["vtp-large"]()
    params = init_vtp_params(jax.random.key(0), cfg)
    text_bf16 = cast_matmul_params(params["text"], jnp.bfloat16)
    tokenizer = get_tokenizer(context_length=cfg.text_context_length)

    results = {}
    for tag, text_params in (
        ("bf16", text_bf16),
        ("int8", quantize_matmul_params(params["text"])),
    ):
        p = dict(params)
        p["text"] = jax.device_put(text_params)
        # warm build (compile + token cache), then timed build
        t0 = time.perf_counter()
        c = build_zero_shot_classifier(p, cfg, tokenizer)
        _ = float(c.ravel()[0].astype(jnp.float32))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        c = build_zero_shot_classifier(p, cfg, tokenizer)
        _ = float(c.ravel()[0].astype(jnp.float32))
        dt = time.perf_counter() - t0
        results[tag] = (dt, np.asarray(c, np.float32))
        print(f"{tag}: build {dt:.2f} s (first incl. compile {warm:.2f} s)")

    (t_bf, c_bf), (t_i8, c_i8) = results["bf16"], results["int8"]
    cos = np.sum(c_bf * c_i8, axis=0)  # columns are unit-norm
    print(f"speedup int8/bf16: {t_bf / t_i8:.2f}x; classifier column "
          f"cosine vs bf16: mean {cos.mean():.5f} min {cos.min():.5f}")


if __name__ == "__main__":
    main()
