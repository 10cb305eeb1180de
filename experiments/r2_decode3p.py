"""Measure in-kernel 3-pass fp32 attention for the decoder and re-trace
the padded encode for the remaining non-GEMM residue."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import PRESETS
from vtp_tpu.models.pixel_decoder import _pixel_decoder_forward
from vtp_tpu.models.vtp_model import (
    decoder_config_from,
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
    dcfg = decoder_config_from(cfg)
    print(f"device: {jax.devices()[0]}", flush=True)
    params = init_vtp_params(jax.random.key(0), cfg)
    params["trunk"] = cast_matmul_params(params["trunk"], jnp.bfloat16)
    params = jax.device_put(params)
    g = cfg.latent_grid
    lat = jax.random.normal(jax.random.key(2), (BATCH, cfg.vision_feature_bottleneck, g, g))
    img = jax.random.normal(jax.random.key(1), (BATCH, 3, cfg.image_size, cfg.image_size))

    def decode_prec(precision):
        def f(params, latents, carry):
            latents = latents + (1e-6 * carry).astype(latents.dtype)
            with jax.default_matmul_precision(precision):
                return _pixel_decoder_forward(params["pixel_decoder"], dcfg, latents, None)
        return jax.jit(f)

    jdec_hi = decode_prec("high")
    jdec_f32 = decode_prec("float32")
    t_hi = timed("decode-high(3pass incl. attn)", jdec_hi, params, lat)

    # revalidate: full 3-pass (GEMMs + in-kernel attention) vs exact
    zero = jnp.zeros((), jnp.float32)
    out_f32 = jdec_f32(params, lat, zero)
    out_hi = jdec_hi(params, lat, zero)
    lat_bf16 = lat.astype(jnp.bfloat16).astype(jnp.float32)
    out_noise = jdec_f32(params, lat_bf16, zero)
    a = np.asarray(out_f32, np.float64)
    b = np.asarray(out_hi, np.float64)
    c = np.asarray(out_noise, np.float64)
    scale = np.abs(a).mean()
    print(f"[prec] 3-pass-full vs 6-pass: max|d| {np.abs(a-b).max():.3e} "
          f"rel {np.abs(a-b).mean()/scale:.3e}", flush=True)
    print(f"[prec] bf16-latent noise:     max|d| {np.abs(a-c).max():.3e} "
          f"rel {np.abs(a-c).mean()/scale:.3e}", flush=True)

    def roundtrip(params, image, carry):
        image = image + (1e-6 * carry).astype(image.dtype)
        z = get_reconstruction_latents(params, cfg, image, jnp.bfloat16)
        with jax.default_matmul_precision("high"):
            return _pixel_decoder_forward(params["pixel_decoder"], dcfg, z, None)
    t_rt = timed("roundtrip-high", jax.jit(roundtrip), params, img)

    # re-trace the padded encode
    def encode(params, image, carry):
        image = image + (1e-6 * carry).astype(image.dtype)
        return get_reconstruction_latents(params, cfg, image, jnp.bfloat16)
    jenc = jax.jit(encode)
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    carry = jnp.zeros((), jnp.float32)
    _ = float(tap(jenc(params, img, carry)))
    jax.profiler.start_trace("/root/repo/traces/enc_pad")
    for _ in range(3):
        out = jenc(params, img, carry)
        carry = tap(out)
    _ = float(carry)
    jax.profiler.stop_trace()
    print("[trace] enc_pad -> /root/repo/traces/enc_pad", flush=True)

    # and the 3-pass decode
    carry = jnp.zeros((), jnp.float32)
    jax.profiler.start_trace("/root/repo/traces/dec_hi")
    for _ in range(3):
        out = jdec_hi(params, lat, carry)
        carry = tap(out)
    _ = float(carry)
    jax.profiler.stop_trace()
    print("[trace] dec_hi -> /root/repo/traces/dec_hi", flush=True)
    print("JOB-DONE", flush=True)


if __name__ == "__main__":
    main()
