"""Probe: int8 W8A8 DiT-XL/1 sampling (serving option, round 3b).

DiT params all route through ops.ffn.linear, which dispatches on the
{q, scale, bias} quantized form — so int8 sampling is
quantize_matmul_params(ema_params) with no model changes. Sampling
GEMMs run at ~94% of bf16 peak (42 of the 52.9 ms euler step); the
int8 MXU rate is ~2x bf16 on v5e, so the ceiling is ~1.55x.

Quality proxy without trained weights/data: relative error of the
predicted velocity field vs the bf16 forward on the same (random-init,
EMA-smoothed) weights, plus final-sample pixel deviation through the
full 250-step sampler (errors compound across steps — the honest
number for the serving tradeoff).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vtp_tpu.dit.model import dit_forward, init_dit_params, make_dit_config
from vtp_tpu.dit.sample import make_sampler
from vtp_tpu.utils.params import cast_matmul_params
from vtp_tpu.utils.quantization import quantize_matmul_params

BATCH = 32
NUM_STEPS = 50  # enough euler steps for stable timing + compounding check

print("devices:", jax.devices(), flush=True)
cfg = make_dit_config("DiT-XL/1")
params_f = init_dit_params(jax.random.key(0), cfg)
# adaLN-zero init makes the raw model output exactly 0 — perturb all
# weights so the deviation proxy and the sampler see a non-trivial
# velocity field (same perturbed weights feed both variants)
leaves, treedef = jax.tree.flatten(params_f)
ks = jax.random.split(jax.random.key(99), len(leaves))
params_f = jax.tree.unflatten(treedef, [
    l + 0.02 * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
    for l, k in zip(leaves, ks)])
params_bf = jax.device_put(cast_matmul_params(params_f, jnp.bfloat16))
# quantize everything linear except the final projection (output
# quality) — embedders/ada included; measure, then reconsider
params_q = jax.device_put(quantize_matmul_params(
    params_f, exclude=lambda k: k in ("x_embed", "final")))
del params_f

# --- single-forward velocity deviation
x = jax.random.normal(jax.random.key(1), (BATCH, cfg.in_channels,
                                          cfg.input_size, cfg.input_size))
t = jnp.full((BATCH,), 0.5, jnp.float32)
y = jnp.arange(BATCH) % cfg.num_classes
f = jax.jit(lambda p, x: dit_forward(p, cfg, x, t, y,
                                     compute_dtype=jnp.bfloat16))
v_bf = np.asarray(f(params_bf, x), np.float32)
v_q = np.asarray(f(params_q, x), np.float32)
rel = np.linalg.norm(v_q - v_bf) / np.linalg.norm(v_bf)
print(f"single-forward velocity rel err: {rel:.4f}", flush=True)


def bench(name, params):
    sampler = make_sampler(cfg, num_steps=NUM_STEPS)
    labels = jnp.arange(BATCH) % cfg.num_classes
    out = sampler(params, jax.random.key(2), labels)
    _ = float(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        out = sampler(params, jax.random.fold_in(jax.random.key(3), i), labels)
        _ = float(out.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    sps = BATCH / dt
    print(f"{name}: {dt*1e3:.0f} ms/batch ({NUM_STEPS} steps) = "
          f"{sps:.2f} samples/s ({dt*1e3/NUM_STEPS:.1f} ms/euler-step)",
          flush=True)
    return np.asarray(out, np.float32)


s_bf = bench("bf16", params_bf)
s_q = bench("int8", params_q)
rel_s = np.linalg.norm(s_q - s_bf) / np.linalg.norm(s_bf)
print(f"compounded {NUM_STEPS}-step sample rel err: {rel_s:.4f}", flush=True)
print("DONE", flush=True)
