"""VTP-L train-step: old default vs new options."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state

cfg = PRESETS["vtp-large"]()
print(f"device: {jax.devices()[0]}", flush=True)
B = 32

def measure(remat, unroll, iters=10):
    tcfg = TrainConfig(train_ssl=False, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    b = {"image": jax.random.normal(k1, (B, 3, 256, 256)),
         "text": jax.random.randint(k2, (B, 77), 1, 49000),
         "rec_image": jax.random.normal(k1, (B, 3, 256, 256))}
    t0 = time.perf_counter()
    state, m = step(state, b, jax.random.key(2))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s loss={float(m['loss/total']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, b, jax.random.key(3 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  remat={remat} unroll={unroll}: {dt*1e3:.1f} ms/step, {B/dt:.1f} img/s", flush=True)
    return B / dt

results = {}
for remat, unroll in [(True, False), ("attn", True), (False, True), ("dots_attn", True)]:
    tag = f"{remat}_u{int(unroll)}"
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure(remat, unroll)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:180]}", flush=True)
        results[tag] = None
print(json.dumps(results), flush=True)
print("DONE", flush=True)
