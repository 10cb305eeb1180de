"""Measure token-alignment padding + 3-pass decode on the real chip.

1. encode (bf16) with and without token padding: timing + output diff
2. roundtrip float32 (6-pass) and high (3-pass) decode timings
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import PRESETS
from vtp_tpu.models.vtp_model import (
    get_latents_decoded_images,
    get_reconstruction_latents,
    init_vtp_params,
)
from vtp_tpu.utils import cast_matmul_params

BATCH = 32
ITERS = 20


def timed(tag, jfn, params, x, iters=ITERS):
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    out = jfn(params, x, zero)
    _ = float(tap(out))
    print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    _ = float(tap(jfn(params, x, zero)))
    t0 = time.perf_counter()
    carry = zero
    for _ in range(iters):
        out = jfn(params, x, carry)
        carry = tap(out)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"[{tag}] {dt*1e3:.3f} ms/step  {BATCH/dt:.1f} img/s", flush=True)
    return dt


def main():
    cfg = PRESETS["vtp-large"]()
    print(f"device: {jax.devices()[0]}", flush=True)
    params = init_vtp_params(jax.random.key(0), cfg)
    params["trunk"] = cast_matmul_params(params["trunk"], jnp.bfloat16)
    params = jax.device_put(params)

    img = jax.random.normal(jax.random.key(1), (BATCH, 3, cfg.image_size, cfg.image_size))

    def make_encode():
        # reads VTP_DISABLE_TOKEN_PAD at trace time
        def encode(params, image, carry):
            image = image + (1e-6 * carry).astype(image.dtype)
            return get_reconstruction_latents(params, cfg, image, jnp.bfloat16)
        return jax.jit(encode)

    def make_roundtrip(precision):
        def rt(params, image, carry):
            image = image + (1e-6 * carry).astype(image.dtype)
            lat = get_reconstruction_latents(params, cfg, image, jnp.bfloat16)
            with jax.default_matmul_precision(precision):
                from vtp_tpu.models.pixel_decoder import _pixel_decoder_forward
                from vtp_tpu.models.vtp_model import decoder_config_from
                return _pixel_decoder_forward(
                    params["pixel_decoder"], decoder_config_from(cfg), lat, None)
        return jax.jit(rt)

    zero = jnp.zeros((), jnp.float32)

    os.environ["VTP_DISABLE_TOKEN_PAD"] = "1"
    enc_nopad = make_encode()
    t_nopad = timed("encode-nopad", enc_nopad, params, img)
    out_nopad = np.asarray(enc_nopad(params, img, zero), np.float32)

    os.environ.pop("VTP_DISABLE_TOKEN_PAD")
    enc_pad = make_encode()
    t_pad = timed("encode-pad", enc_pad, params, img)
    out_pad = np.asarray(enc_pad(params, img, zero), np.float32)

    scale = np.abs(out_nopad).mean()
    print(f"[pad] encode diff: max|d| {np.abs(out_nopad-out_pad).max():.3e} "
          f"mean|d| {np.abs(out_nopad-out_pad).mean():.3e} (scale {scale:.4f})",
          flush=True)
    print(f"[pad] encode speedup {t_nopad/t_pad:.3f}x", flush=True)

    t_rt6 = timed("roundtrip-f32(6pass)", make_roundtrip("float32"), params, img)
    t_rt3 = timed("roundtrip-high(3pass)", make_roundtrip("high"), params, img)
    print(f"[summary] enc {t_pad*1e3:.2f}ms rt6 {t_rt6*1e3:.2f}ms "
          f"({BATCH/t_rt6:.1f} img/s) rt3 {t_rt3*1e3:.2f}ms ({BATCH/t_rt3:.1f} img/s)",
          flush=True)
    print("JOB-DONE", flush=True)


if __name__ == "__main__":
    main()
