"""SSL step with fused CE kernel: measure + loss parity vs fallback."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state, make_ssl_batch

cfg = PRESETS["vtp-base"]()
print(f"device: {jax.devices()[0]}", flush=True)
B = 32
tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                   remat=False, unroll_layers=True)

def run(tag):
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    b = {
        "image": jax.random.normal(k1, (B, 3, 256, 256)),
        "text": jax.random.randint(k2, (B, 77), 1, 49000),
        "rec_image": jax.random.normal(k1, (B, 3, 256, 256)),
        "ssl": make_ssl_batch(jax.random.key(4), B, global_size=256, patch=16),
    }
    t0 = time.perf_counter()
    state, m = step(state, b, jax.random.key(2))
    losses = {k: float(v) for k, v in m.items() if k.startswith("loss")}
    print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"[{tag}] losses {losses}", flush=True)
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, b, jax.random.key(3 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / 10
    print(f"[{tag}] {dt*1e3:.1f} ms/step, {B/dt:.1f} img/s", flush=True)
    return losses

l_fused = run("fused-ce")
os.environ["VTP_DISABLE_FUSED_CE"] = "1"
l_ref = run("xla-ce")
for k in l_fused:
    d = abs(l_fused[k] - l_ref[k])
    print(f"  {k}: fused {l_fused[k]:.5f} xla {l_ref[k]:.5f} diff {d:.2e}", flush=True)
print("DONE", flush=True)
