"""Round-2 perf investigation on the real TPU chip (run with nohup).

Gathers, in ONE process (one TPU grant):
  1. steady-state encode / decode / roundtrip ms at batch 32 (re-baseline)
  2. jax.profiler traces of encode and decode steady-state loops
  3. VTP_DECODE_PRECISION=high (3-pass) decode: timing + output delta vs
     the 6-pass float32 path, compared against the bf16-encode noise
     floor (is 3-pass decode error << encode quantization error?)

Writes logs to stdout; traces under /root/repo/traces/{enc,dec}.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vtp_tpu.config import PRESETS
from vtp_tpu.models.vtp_model import (
    get_latents_decoded_images,
    get_reconstruction_latents,
    init_vtp_params,
)
from vtp_tpu.models.pixel_decoder import _pixel_decoder_forward
from vtp_tpu.models.vtp_model import decoder_config_from
from vtp_tpu.utils import cast_matmul_params

BATCH = 32
ITERS = 20


def timed(tag, jfn, x, params, iters=ITERS):
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

    def encode(params, image, carry):
        image = image + (1e-6 * carry).astype(image.dtype)
        return get_reconstruction_latents(params, cfg, image, jnp.bfloat16)

    def decode(params, latents, carry):
        latents = latents + (1e-6 * carry).astype(latents.dtype)
        return get_latents_decoded_images(params, cfg, latents, None)

    def roundtrip(params, image, carry):
        image = image + (1e-6 * carry).astype(image.dtype)
        lat = get_reconstruction_latents(params, cfg, image, jnp.bfloat16)
        return get_latents_decoded_images(params, cfg, lat, None)

    g = cfg.latent_grid
    img = jax.random.normal(jax.random.key(1), (BATCH, 3, cfg.image_size, cfg.image_size))
    lat = jax.random.normal(jax.random.key(2), (BATCH, cfg.vision_feature_bottleneck, g, g))

    jenc = jax.jit(encode)
    jdec = jax.jit(decode)
    jrt = jax.jit(roundtrip)

    t_enc = timed("encode", jenc, img, params)
    t_dec = timed("decode", jdec, lat, params)
    t_rt = timed("roundtrip", jrt, img, params)
    print(f"[summary] enc {t_enc*1e3:.2f} dec {t_dec*1e3:.2f} rt {t_rt*1e3:.2f} "
          f"(sum {1e3*(t_enc+t_dec):.2f}) ms", flush=True)

    # ---- traces -------------------------------------------------------
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    for tag, jfn, x in [("enc", jenc, img), ("dec", jdec, lat)]:
        logdir = f"/root/repo/traces/{tag}"
        carry = jnp.zeros((), jnp.float32)
        jax.profiler.start_trace(logdir)
        for _ in range(3):
            out = jfn(params, x, carry)
            carry = tap(out)
        _ = float(carry)
        jax.profiler.stop_trace()
        print(f"[trace] {tag} -> {logdir}", flush=True)

    # ---- 3-pass decode: speed + error vs 6-pass ----------------------
    dcfg = decoder_config_from(cfg)

    def decode_prec(precision):
        def f(params, latents, carry):
            latents = latents + (1e-6 * carry).astype(latents.dtype)
            with jax.default_matmul_precision(precision):
                return _pixel_decoder_forward(params["pixel_decoder"], dcfg, latents, None)
        return jax.jit(f)

    jdec_hi = decode_prec("high")
    t_hi = timed("decode-high(3pass)", jdec_hi, lat, params)

    zero = jnp.zeros((), jnp.float32)
    out_f32 = jdec(params, lat, zero)
    out_hi = jdec_hi(params, lat, zero)
    # encode-noise floor: decode(fp32) of latents perturbed by bf16 rounding
    lat_bf16 = lat.astype(jnp.bfloat16).astype(jnp.float32)
    out_f32_bf16lat = jdec(params, lat_bf16, zero)

    import numpy as np
    a = np.asarray(out_f32, np.float64)
    b = np.asarray(out_hi, np.float64)
    c = np.asarray(out_f32_bf16lat, np.float64)
    scale = np.abs(a).mean()
    print(f"[prec] output scale {scale:.5f}", flush=True)
    print(f"[prec] 3-pass vs 6-pass: max|d| {np.abs(a-b).max():.3e} "
          f"mean|d| {np.abs(a-b).mean():.3e} rel {np.abs(a-b).mean()/scale:.3e}", flush=True)
    print(f"[prec] bf16-latent noise floor: max|d| {np.abs(a-c).max():.3e} "
          f"mean|d| {np.abs(a-c).mean():.3e} rel {np.abs(a-c).mean()/scale:.3e}", flush=True)

    print("JOB-DONE", flush=True)


if __name__ == "__main__":
    main()
