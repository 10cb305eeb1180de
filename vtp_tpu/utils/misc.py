"""Shared small utilities (reference vtp/models/utils/utils.py and
text_utils.py equivalents that make sense in a functional JAX codebase)."""

from __future__ import annotations

import collections.abc
import random
import subprocess
from itertools import repeat
from typing import Any, Callable, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def cat_keep_shapes(x_list: Sequence[jax.Array]) -> Tuple[jax.Array, List[Tuple[int, ...]], List[int]]:
    """Flatten a list of (..., D) tensors into one (sum, D) matrix
    (models/utils/utils.py:14-18); see also models.blocks.pack."""
    shapes = [tuple(x.shape) for x in x_list]
    num_tokens = [int(np.prod(x.shape[:-1])) for x in x_list]
    flat = jnp.concatenate([x.reshape(-1, x.shape[-1]) for x in x_list], axis=0)
    return flat, shapes, num_tokens


def uncat_with_shapes(flat: jax.Array, shapes, num_tokens) -> List[jax.Array]:
    out, off = [], 0
    for shape, n in zip(shapes, num_tokens):
        out.append(jax.lax.slice_in_dim(flat, off, off + n, axis=0).reshape(shape))
        off += n
    return out


def named_apply(fn: Callable[[Tuple[str, ...], Any], Any], tree: Any) -> Any:
    """Apply fn(path, leaf) over a param pytree, returning a new tree —
    the functional analogue of the reference's module visitor
    (models/utils/utils.py:53-80)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        names = tuple(k.key if hasattr(k, "key") else str(k) for k in path)
        leaves.append(fn(names, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fix_random_seeds(seed: int = 31) -> jax.Array:
    """Seed python/numpy RNGs and return a JAX key
    (models/utils/utils.py:83-90 analogue)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def get_sha() -> str:
    """Best-effort git SHA of the working tree (utils.py:93-110)."""
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
        ).decode().strip()
        dirty = subprocess.call(
            ["git", "diff", "--quiet"], stderr=subprocess.DEVNULL
        ) != 0
        return sha + (" (dirty)" if dirty else "")
    except Exception:
        return "unknown"


def to_ntuple(n: int):
    """timm-style arg-to-tuple helper (text_utils.py:70-82)."""

    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_2tuple = to_ntuple(2)


# numpy <-> jax dtype mapping (reference models/utils/dtype.py analogue)
_NP_TO_JNP = {
    np.dtype("bool"): jnp.bool_,
    np.dtype("uint8"): jnp.uint8,
    np.dtype("int8"): jnp.int8,
    np.dtype("int16"): jnp.int16,
    np.dtype("int32"): jnp.int32,
    np.dtype("int64"): jnp.int64,
    np.dtype("float16"): jnp.float16,
    np.dtype("float32"): jnp.float32,
    np.dtype("float64"): jnp.float64,
}


def as_jax_dtype(spec) -> jnp.dtype:
    """str / numpy dtype / jax dtype -> jax dtype ('bf16' included)."""
    if isinstance(spec, str):
        named = {"fp32": jnp.float32, "fp16": jnp.float16, "bf16": jnp.bfloat16,
                 "float32": jnp.float32, "float16": jnp.float16,
                 "bfloat16": jnp.bfloat16}
        if spec in named:
            return named[spec]
        return jnp.dtype(spec)
    d = np.dtype(spec) if not hasattr(spec, "itemsize") else spec
    return _NP_TO_JNP.get(np.dtype(d), jnp.dtype(d))
