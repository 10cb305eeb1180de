"""Round-2b experiment (kept for the record; see PERF.md train-step
section for results). Run on the axon TPU: nohup python -u <file> > log &
"""
"""Sweep best remat/unroll configs on the full CLIP+SSL+rec step."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax
from vtp_tpu.config import PRESETS
from vtp_tpu.train.step import TrainConfig, build_train_step, init_state, make_ssl_batch
from bench import train_sol_imgs_per_sec

cfg = PRESETS["vtp-base"]()
print(f"device: {jax.devices()[0]}", flush=True)

def measure(remat, unroll, batch=32, iters=10):
    tcfg = TrainConfig(train_ssl=True, warmup_steps=0, total_steps=1000,
                       remat=remat, unroll_layers=unroll)
    state = init_state(jax.random.key(0), cfg, tcfg)
    step = jax.jit(build_train_step(cfg, tcfg), donate_argnums=(0,))
    k1, k2 = jax.random.split(jax.random.key(1))
    b = {
        "image": jax.random.normal(k1, (batch, 3, cfg.image_size, cfg.image_size)),
        "text": jax.random.randint(k2, (batch, cfg.text_context_length), 1,
                                   cfg.text_vocab_size - 1),
        "rec_image": jax.random.normal(k1, (batch, 3, cfg.image_size, cfg.image_size)),
        "ssl": make_ssl_batch(jax.random.key(4), batch, global_size=cfg.image_size,
                              patch=cfg.vision_patch_size),
    }
    t0 = time.perf_counter()
    state, m = step(state, b, jax.random.key(2))
    print(f"  compile+first {time.perf_counter()-t0:.1f}s loss={float(m['loss/total']):.4f}", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, b, jax.random.key(3 + i))
    _ = float(m["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    sol = train_sol_imgs_per_sec(cfg, remat=False, ssl=True)
    print(f"  remat={remat} unroll={unroll} B={batch}: {dt*1e3:.1f} ms/step, "
          f"{batch/dt:.1f} img/s ({batch/dt/sol*100:.1f}% of no-remat SoL)", flush=True)
    return batch / dt

results = {}
for remat, unroll in [("dots_attn", True), (False, True), ("attn", True)]:
    tag = f"{remat}_u{int(unroll)}"
    print(f"== {tag}", flush=True)
    try:
        results[tag] = measure(remat, unroll)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[tag] = None
print(json.dumps(results), flush=True)
print("DONE", flush=True)
