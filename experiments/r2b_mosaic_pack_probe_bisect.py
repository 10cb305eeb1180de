"""Bisect: scratch roundtrip identity, and per-head dots read from scratch."""
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

# A) scratch roundtrip: q slabs through scratch, back out per head
def k_roundtrip(qkv_ref, o_ref, qs):
    for hb in range(H // 2):
        for j in range(2):
            h = hb * 2 + j
            qs[j*N:(j+1)*N, :] = qkv_ref[0, :, h*d:(h+1)*d]
        for j in range(2):
            h = hb * 2 + j
            o_ref[0, :, h*d:(h+1)*d] = qs[j*N:(j+1)*N, :]

def roundtrip(x):
    return pl.pallas_call(k_roundtrip, grid=(B,), in_specs=[spec], out_specs=ospec,
                          out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
                          scratch_shapes=[pltpu.VMEM((M, d), jnp.bfloat16)])(x)

got = np.asarray(jax.jit(roundtrip)(qkv))
want = np.asarray(qkv[:, :, :D])
print("A) scratch roundtrip max diff:", np.abs(got.astype(np.float32) - want.astype(np.float32)).max(), flush=True)

# B) per-head attention but q/k/v read from the PACKED scratch (no big dot)
def k_perhead(qkv_ref, o_ref, qs, ks, vs):
    for hb in range(H // 2):
        for j in range(2):
            h = hb * 2 + j
            qs[j*N:(j+1)*N, :] = qkv_ref[0, :, h*d:(h+1)*d]
            ks[j*N:(j+1)*N, :] = qkv_ref[0, :, D + h*d:D + (h+1)*d]
            vs[j*N:(j+1)*N, :] = qkv_ref[0, :, 2*D + h*d:2*D + (h+1)*d]
        for j in range(2):
            h = hb * 2 + j
            q = qs[j*N:(j+1)*N, :]
            k = ks[j*N:(j+1)*N, :]
            v = vs[j*N:(j+1)*N, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            pr = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            o = jax.lax.dot_general(pr, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, h*d:(h+1)*d] = o.astype(o_ref.dtype)

def perhead(x):
    return pl.pallas_call(k_perhead, grid=(B,), in_specs=[spec], out_specs=ospec,
                          out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
                          scratch_shapes=[pltpu.VMEM((M, d), jnp.bfloat16)]*3)(x)

def ref_attn(x):
    q = x[:, :, :D].reshape(B, N, H, d).astype(jnp.float32)
    k = x[:, :, D:2*D].reshape(B, N, H, d).astype(jnp.float32)
    v = x[:, :, 2*D:].reshape(B, N, H, d).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.bfloat16).astype(jnp.float32),
                   k.astype(jnp.bfloat16).astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(jnp.bfloat16).astype(jnp.float32), v).reshape(B, N, D)

got = np.asarray(jax.jit(perhead)(qkv).astype(jnp.float32))
want = np.asarray(ref_attn(qkv))
print("B) per-head-from-scratch max diff:", np.abs(got - want).max(), flush=True)
print("DONE", flush=True)
