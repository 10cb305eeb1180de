"""Round-2b experiment (kept for the record; see PERF.md train-step
section for results). Run on the axon TPU: nohup python -u <file> > log &
"""
"""Scan vs unroll vs split-transpose backward, python-chained timing."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from vtp_tpu.utils.profiling import time_fn
from vtp_tpu.models.blocks import (BlockConfig, init_stacked_blocks, block_apply,
                                   scan_blocks, remat_wrap)

print(f"device: {jax.devices()[0]}", flush=True)
B, N = 32, 272
cfg = BlockConfig(dim=768, num_heads=12, ffn_ratio=3.0, ffn_layer="swiglu64",
                  norm_kind="layernormbf16", layerscale_init=1e-5, mask_k_bias=True)
depth = 12
stacked = init_stacked_blocks(jax.random.key(1), cfg, depth)
x0 = jax.random.normal(jax.random.key(2), (B, N, 768), jnp.float32)


def fwd_scan(params, x, remat):
    out, _ = scan_blocks((x,), params, cfg, [None], depth=depth,
                         compute_dtype=jnp.bfloat16, remat=remat)
    return out[0].astype(jnp.float32).sum()


def fwd_scan_split(params, x, remat):
    def body(carry, p):
        return block_apply(carry, p, cfg, [None], compute_dtype=jnp.bfloat16), None
    body = remat_wrap(body, remat)
    out, _ = jax.lax.scan(body, (x,), params, _split_transpose=True)
    return out[0].astype(jnp.float32).sum()


def fwd_unroll(params, x, remat):
    xs = (x,)
    body = remat_wrap(lambda xs_, p__: block_apply(xs_, p__, cfg, [None],
                                                   compute_dtype=jnp.bfloat16), remat)
    for i in range(depth):
        xs = body(xs, jax.tree.map(lambda a: a[i], params))
    return xs[0].astype(jnp.float32).sum()


def grad_fn(f, remat):
    def g(params, x, carry):
        gr = jax.grad(f)(params, x + carry, remat)
        return gr["attn"]["qkv"]["kernel"]
    return jax.jit(g)


for name, f, remat in [
    ("scan remat=full", fwd_scan, True),
    ("unroll remat=full", fwd_unroll, True),
    ("scan remat=attn", fwd_scan, "attn"),
    ("unroll remat=attn", fwd_unroll, "attn"),
    ("scan remat=dots", fwd_scan, "dots"),
    ("unroll no-remat", fwd_unroll, False),
    ("scan no-remat", fwd_scan, False),
    ("scan split_T full", fwd_scan_split, True),
]:
    try:
        t0 = time.perf_counter()
        dt = time_fn(grad_fn(f, remat), stacked, x0, iters=8,
                     chain=lambda gr: gr[0, 0, 1].astype(jnp.float32) * 1e-9)
        print(f"  trunk12 fwd+bwd {name:24s} {dt*1e3:8.2f} ms   (compile+total {time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)
print("DONE", flush=True)
