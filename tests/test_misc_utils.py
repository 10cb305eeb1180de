"""Misc utils: dtype map, tensor packing, resolution buckets."""

import numpy as np

import jax.numpy as jnp

from vtp_tpu.utils.misc import as_jax_dtype, cat_keep_shapes, uncat_with_shapes


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


def test_resolution_buckets(rng):
    from vtp_tpu.utils.buckets import pick_bucket, snap_to_bucket

    assert pick_bucket(200) == 224
    assert pick_bucket(256) == 256
    assert pick_bucket(1000) == 512
    x = rng.standard_normal((2, 3, 200, 300)).astype(np.float32)
    out, (h, w) = snap_to_bucket(x)
    assert out.shape == (2, 3, 384, 384) and (h, w) == (200, 300)
    # content preserved at the center
    np.testing.assert_array_equal(out[:, :, 92:292, 42:342], x)
    big = rng.standard_normal((1, 3, 600, 600)).astype(np.float32)
    out2, _ = snap_to_bucket(big)
    assert out2.shape == (1, 3, 512, 512)
