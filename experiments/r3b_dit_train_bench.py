"""DiT-XL/1 train wall bench after the qk-norm backward kernel arm
(round 3b): remat='attn' + unroll at B=32 (the round-2b operating
point, then 94.3 img/s) and B=64 (previously HBM-OOM at sampling; the
fp32 score buffers from the recompute VJP are gone from the backward)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax

from vtp_tpu.dit.model import make_dit_config
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

print(f"device: {jax.devices()[0]}", flush=True)
cfg = make_dit_config("DiT-XL/1")


def measure(remat, unroll, B, iters=12):
    tcfg = DiTTrainConfig(remat=remat, unroll_layers=unroll)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    lat = jax.random.normal(jax.random.key(1), (B, cfg.in_channels,
                                                cfg.input_size, cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)
    t0 = time.perf_counter()
    state, m = step(state, lat, lab, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss/transport']):.4f} "
          f"gnorm={float(m['grad_norm']):.1f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, lat, lab, jax.random.key(4 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  remat={remat} unroll={unroll} B={B}: {dt*1e3:.1f} ms/step, "
          f"{B/dt:.1f} img/s", flush=True)
    return B / dt


results = {}
for remat, unroll, B in [("attn", True, 32), ("attn", True, 64)]:
    tag = f"{remat}_u{int(unroll)}_b{B}"
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure(remat, unroll, B)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        results[tag] = None
print(json.dumps(results), flush=True)
print("DONE", flush=True)
