"""Workaround probe: force dot operands through a VPU op after scratch stores."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"device: {jax.devices()[0]}", flush=True)
B, H, N, d = 2, 4, 272, 64
D = H * d
key = jax.random.key(0)
qkv = jax.random.normal(key, (B, N, 3 * D), jnp.bfloat16)
M = 2 * N

spec = pl.BlockSpec((1, N, 3*D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
ospec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

def ref_attn(x):
    q = x[:, :, :D].reshape(B, N, H, d).astype(jnp.float32)
    k = x[:, :, D:2*D].reshape(B, N, H, d).astype(jnp.float32)
    v = x[:, :, 2*D:].reshape(B, N, H, d).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, D)

want = np.asarray(ref_attn(qkv))

def k_packed_forced(qkv_ref, o_ref, qs, ks, vs):
    P_, nh = 2, H // 2
    for hb in range(nh):
        for j in range(P_):
            h = hb * P_ + j
            qs[j*N:(j+1)*N, :] = qkv_ref[0, :, h*d:(h+1)*d]
            ks[j*N:(j+1)*N, :] = qkv_ref[0, :, D + h*d:D + (h+1)*d]
            vs[j*N:(j+1)*N, :] = qkv_ref[0, :, 2*D + h*d:2*D + (h+1)*d]
        # force the packed operands through the VPU (ordering barrier for
        # the store -> MXU-read dependency Mosaic appears to drop)
        qv = jnp.maximum(qs[:, :], qs[:, :])
        kv = jnp.maximum(ks[:, :], ks[:, :])
        vv = jnp.maximum(vs[:, :], vs[:, :])
        s = jax.lax.dot_general(qv, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
        s = jnp.where((row < N) == (col < N), s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        pr = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(pr, vv, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        for j in range(P_):
            h = hb * P_ + j
            o_ref[0, :, h*d:(h+1)*d] = o[j*N:(j+1)*N].astype(o_ref.dtype)

def packed(x):
    return pl.pallas_call(k_packed_forced, grid=(B,), in_specs=[spec], out_specs=ospec,
                          out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
                          scratch_shapes=[pltpu.VMEM((M, d), jnp.bfloat16)]*3)(x)

got = np.asarray(jax.jit(packed)(qkv).astype(jnp.float32))
per_head = [np.abs(got[:, :, h*d:(h+1)*d] - want[:, :, h*d:(h+1)*d]).max() for h in range(H)]
print("packed+forced per-head err:", per_head, flush=True)
print("DONE", flush=True)
