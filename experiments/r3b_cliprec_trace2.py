"""Round 3b: fresh trace of the current-best CLIP+rec step (VTP-B,
B=32, no-remat unrolled, text tower unrolled) to bucket the gap
between 207 img/s measured and 431 analytic matmul SoL. Known step
count; classifier separates attention custom-calls / optimizer
fusions / DUS save-buffers / other."""
import glob
import sys

sys.path.insert(0, "/root/repo")

from vtp_tpu.utils.env import apply_jax_platforms_env

apply_jax_platforms_env()

import jax

from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

BATCH = 32
STEPS = 4
TRACE_DIR = "/root/repo/traces/r3b_cliprec"

print(f"device: {jax.devices()[0]}", flush=True)
cfg = PRESETS["vtp-base"]()
tcfg = TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000,
                   remat=False, unroll_layers=True)
state = init_state(jax.random.key(0), cfg, tcfg)
step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
k1, k2 = jax.random.split(jax.random.key(1))
batch = {
    "image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
    "text": jax.random.randint(k2, (BATCH, 77), 1, 49000),
    "rec_image": jax.random.normal(k1, (BATCH, 3, 256, 256)),
}
state, m = step(state, batch, jax.random.key(2))
print("compiled; loss", float(m["loss/total"]), flush=True)

with jax.profiler.trace(TRACE_DIR):
    for i in range(STEPS):
        state, m = step(state, batch, jax.random.key(3 + i))
    _ = float(m["loss/total"])
print("traced", flush=True)

from vtp_tpu.utils.xplane import exclusive_op_summary, parse_xspace

pb = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))[-1]
rows = exclusive_op_summary(parse_xspace(open(pb, "rb").read()))
total = sum(r["total_ms"] for r in rows)
print(f"\ntotal exclusive {total:.1f} ms / {STEPS} = "
      f"{total/STEPS:.1f} ms/step ({BATCH*STEPS/(total/1e3):.1f} img/s)")


def classify(n):
    if "custom-call" in n:
        return "attention kernels (custom-call)"
    if "dynamic-update-slice" in n or "dynamic_update" in n:
        return "DUS save/stack buffers"
    if n.count("f32[") >= 3 and ("fusion" in n) and "(f32[" in n:
        return "optimizer/EMA fp32 tuple fusions"
    if "copy" in n or "bitcast" in n.split("=")[0] or "transpose(" in n:
        return "copies/relayout"
    return "GEMM + fused elementwise"


buckets = {}
for r in rows:
    b = classify(r["name"])
    buckets[b] = buckets.get(b, 0.0) + r["total_ms"]
for b, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f"  {v/STEPS:7.2f} ms/step  {b}")

print("\ntop 40 rows (ms/step, calls/step):")
for r in rows[:40]:
    print(f"  {r['total_ms']/STEPS:7.3f} x{r['count']/STEPS:<5.1f} {r['name'][:115]}")
