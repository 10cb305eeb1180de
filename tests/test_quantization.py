"""Int8 quantization path + misc utils."""

import numpy as np

import jax
import jax.numpy as jnp

from vtp_tpu.utils.misc import as_jax_dtype, cat_keep_shapes, uncat_with_shapes
from vtp_tpu.utils.quantization import int8_linear, quantize_kernel, quantize_matmul_params


def test_int8_linear_close_to_fp(rng):
    k = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
    b = rng.standard_normal(32).astype(np.float32) * 0.01
    x = rng.standard_normal((8, 64)).astype(np.float32)
    want = x @ k + b
    qk = quantize_kernel(jnp.asarray(k))
    got = np.asarray(int8_linear(jnp.asarray(x), qk, jnp.asarray(b)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel  # ~1% typical for int8 per-channel


def test_quantize_tree(rng):
    tree = {"mlp": {"fc1": {"kernel": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
                            "bias": jnp.zeros(4)},
                    "scale_only": {"scale": jnp.ones(4)}}}
    q = quantize_matmul_params(tree)
    assert q["mlp"]["fc1"]["q"].dtype == jnp.int8
    assert "scale" in q["mlp"]["fc1"]
    assert "scale" in q["mlp"]["scale_only"]  # non-linear leaves untouched


def test_dtype_map():
    assert as_jax_dtype("bf16") == jnp.bfloat16
    assert as_jax_dtype(np.float32) == jnp.float32
    assert as_jax_dtype("int8") == jnp.int8


def test_cat_uncat(rng):
    xs = [jnp.asarray(rng.standard_normal((2, 3, 4))), jnp.asarray(rng.standard_normal((5, 4)))]
    flat, shapes, nt = cat_keep_shapes(xs)
    assert flat.shape == (11, 4)
    back = uncat_with_shapes(flat, shapes, nt)
    for a, b in zip(xs, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
