"""Probe: bf16-decode SERVING mode (round 3b).

The fp32 decode (6-pass 'float32', validated 3-pass 'high') exists for
rFID parity with the reference's decode-under-fp32 eval protocol.
Serving doesn't owe the protocol anything — VTPModel(decode_dtype=
jnp.bfloat16) is already plumbed but never measured. This measures
VTP-L 256px decode + roundtrip throughput and the image deviation
(PSNR vs the fp32 decode of the SAME latents) to document the serving
tradeoff.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.config import PRESETS
from vtp_tpu.models.vtp_model import (
    VTPModel,
    get_latents_decoded_images,
    get_reconstruction_latents,
    init_vtp_params,
)

B = 32
print(f"device: {jax.devices()[0]}", flush=True)
cfg = PRESETS["vtp-large"]()
params = init_vtp_params(jax.random.key(0), cfg)
params = jax.device_put(params)
x = jax.random.normal(jax.random.key(1), (B, 3, 256, 256))
lat = jax.jit(lambda p, x: get_reconstruction_latents(p, cfg, x, jnp.bfloat16))(params, x)

modes = {
    "fp32 6-pass (protocol)": (None, "float32"),
    "fp32 3-pass (validated)": (None, "high"),
    "bf16 (serving)": (jnp.bfloat16, None),
}
import os

outs = {}
for name, (cdt, prec) in modes.items():
    if prec is not None:
        os.environ["VTP_DECODE_PRECISION"] = prec
    fn = jax.jit(lambda p, z, cdt=cdt: get_latents_decoded_images(p, cfg, z, cdt))
    out = fn(params, lat)
    _ = float(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    n = 10
    carry = lat
    for i in range(n):
        # chain via a data dependency (tunnel dedup-cache)
        carry = carry + 0.0 * jnp.float32(i)
        out = fn(params, carry.astype(lat.dtype))
    o = np.asarray(out, np.float32)
    dt = (time.perf_counter() - t0) / n
    outs[name] = o
    print(f"{name}: {dt*1e3:.1f} ms/batch = {B/dt:.1f} img/s decode-only",
          flush=True)

ref = outs["fp32 6-pass (protocol)"]
for name, o in outs.items():
    if name == "fp32 6-pass (protocol)":
        continue
    mse = float(np.mean((o - ref) ** 2))
    # protocol images are in normalized space; report PSNR over the
    # actual value range of the reference output
    rng = float(ref.max() - ref.min())
    psnr = 10 * np.log10(rng**2 / max(mse, 1e-12))
    rel = np.linalg.norm(o - ref) / np.linalg.norm(ref)
    print(f"{name}: PSNR vs protocol {psnr:.1f} dB, rel {rel:.2e}", flush=True)
print("DONE", flush=True)
