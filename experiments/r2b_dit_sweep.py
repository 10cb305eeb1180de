"""DiT-XL/1 train-step sweep: remat x unroll."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
from vtp_tpu.dit.model import make_dit_config
from vtp_tpu.dit.train import DiTTrainConfig, build_dit_train_step, init_dit_state

print(f"device: {jax.devices()[0]}", flush=True)
cfg = make_dit_config("DiT-XL/1")
B = 32

def measure(remat, unroll, iters=10):
    tcfg = DiTTrainConfig(remat=remat, unroll_layers=unroll)
    state = init_dit_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_dit_train_step(cfg, tcfg), donate_argnums=(0,))
    lat = jax.random.normal(jax.random.key(1), (B, cfg.in_channels,
                                                cfg.input_size, cfg.input_size))
    lab = jax.random.randint(jax.random.key(2), (B,), 0, cfg.num_classes)
    t0 = time.perf_counter()
    state, m = step(state, lat, lab, jax.random.key(3))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s loss={float(m['loss/transport']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, lat, lab, jax.random.key(4 + i))
    _ = float(m["loss/transport"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  remat={remat} unroll={unroll}: {dt*1e3:.1f} ms/step, {B/dt:.1f} img/s", flush=True)
    return B / dt

results = {}
for remat, unroll in [(True, False), (True, True), ("attn", True), ("dots_attn", True), (False, True)]:
    tag = f"{remat}_u{int(unroll)}"
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure(remat, unroll)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        results[tag] = None
print(json.dumps(results), flush=True)
print("DONE", flush=True)
