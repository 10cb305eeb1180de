"""Round 3: int8 (W8A8 dynamic) encode path — throughput vs the bf16
protocol encode, plus quality deltas, VTP-L 256px random weights.

Run ON TPU: nohup python -u experiments/r3_int8_encode.py > log &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import bootstrap

bootstrap()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import PRESETS
from vtp_tpu.models.vtp_model import (get_latents_decoded_images,
                                      get_reconstruction_latents,
                                      get_last_layer_feature,
                                      init_vtp_params)
from vtp_tpu.utils.params import cast_matmul_params
from vtp_tpu.utils.quantization import quantize_matmul_params

ITERS = 30
print(f"device: {jax.devices()[0]}", flush=True)

cfg = PRESETS["vtp-large"]()
params = init_vtp_params(jax.random.key(0), cfg)
trunk_bf16 = cast_matmul_params(params["trunk"], jnp.bfloat16)
trunk_int8 = quantize_matmul_params(params["trunk"])
del params


def measure(tag, trunk, batch):
    x = jax.random.normal(jax.random.key(1),
                          (batch, 3, cfg.image_size, cfg.image_size), jnp.float32)

    def step(trunk, x, carry):
        xi = x + (1e-6 * carry).astype(x.dtype)
        return get_reconstruction_latents({"trunk": trunk}, cfg, xi, jnp.bfloat16)

    jfn = jax.jit(step)
    tap = jax.jit(lambda o: o.ravel()[0].astype(jnp.float32))
    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    _ = float(tap(jfn(trunk, x, zero)))
    print(f"{tag} b{batch}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    _ = float(tap(jfn(trunk, x, zero)))
    t0 = time.perf_counter()
    carry = zero
    for _ in range(ITERS):
        out = jfn(trunk, x, carry)
        carry = tap(out)
    _ = float(carry)
    dt = time.perf_counter() - t0
    print(f"{tag} b{batch}: {batch*ITERS/dt:.1f} img/s", flush=True)


for batch in (32, 64):
    measure("bf16 encode", trunk_bf16, batch)
    measure("int8 encode", trunk_int8, batch)

# ---- quality deltas (random weights, real image) --------------------
from PIL import Image

img = Image.open("/root/reference/figures/dog.png").convert("RGB").resize((256, 256))
xr = np.asarray(img, np.float32) / 255.0
mean = np.array([0.485, 0.456, 0.406]); std = np.array([0.229, 0.224, 0.225])
xr = ((xr - mean) / std).astype(np.float32).transpose(2, 0, 1)[None]
xr = jnp.asarray(np.repeat(xr, 8, 0))

lat16 = np.asarray(jax.jit(lambda t, x: get_reconstruction_latents(
    {"trunk": t}, cfg, x, jnp.bfloat16))(trunk_bf16, xr), np.float32)
lat8 = np.asarray(jax.jit(lambda t, x: get_reconstruction_latents(
    {"trunk": t}, cfg, x, jnp.bfloat16))(trunk_int8, xr), np.float32)
rel = np.linalg.norm(lat8 - lat16) / np.linalg.norm(lat16)
cos = float((lat8.ravel() @ lat16.ravel())
            / (np.linalg.norm(lat8) * np.linalg.norm(lat16)))
print(f"latents: rel_l2 {rel:.4f}  cos {cos:.6f}", flush=True)

f16 = jax.jit(lambda t, x: get_last_layer_feature(
    {"trunk": t}, cfg, x, compute_dtype=jnp.bfloat16))(trunk_bf16, xr)
f8 = jax.jit(lambda t, x: get_last_layer_feature(
    {"trunk": t}, cfg, x, compute_dtype=jnp.bfloat16))(trunk_int8, xr)
a = np.asarray(f16["cls_token"], np.float32)
b = np.asarray(f8["cls_token"], np.float32)
cos = float(np.mean(np.sum(a*b, -1) / (np.linalg.norm(a, axis=-1)
                                       * np.linalg.norm(b, axis=-1))))
print(f"cls feature cos (per-row mean): {cos:.6f}", flush=True)

# bf16 noise floor for context: bf16 vs fp32 encode of the same input
trunk_f32 = cast_matmul_params(trunk_bf16, jnp.float32)
latf = np.asarray(jax.jit(lambda t, x: get_reconstruction_latents(
    {"trunk": t}, cfg, x, None))(trunk_f32, xr), np.float32)
rel16 = np.linalg.norm(lat16 - latf) / np.linalg.norm(latf)
rel8 = np.linalg.norm(lat8 - latf) / np.linalg.norm(latf)
print(f"vs fp32 oracle: bf16 rel {rel16:.4f}  int8 rel {rel8:.4f}  "
      f"(int8/bf16 noise ratio {rel8/max(rel16,1e-12):.2f}x)", flush=True)
