"""Param-tree utilities."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_matmul_params(params: Any, dtype: jnp.dtype = jnp.bfloat16) -> Any:
    """Cast matmul kernels (and their biases) to ``dtype``, leaving
    norm scales, tokens, and rope tables in fp32.

    Under the reference's autocast protocol, fp32 weights are rounded to
    bf16 at every matmul anyway — storing them in bf16 is numerically
    identical while halving HBM weight traffic on TPU.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        names = [k.key if hasattr(k, "key") else str(k) for k in path]
        if names and names[-1] in ("kernel", "bias") and leaf.dtype == jnp.float32:
            out.append(leaf.astype(dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def fuse_ffn_params(params: Any) -> Any:
    """Fuse SwiGLU w1/w2 into one ``w12`` kernel per block (serving-time
    transformation; numerically identical). Applies recursively to any
    subtree with an ``mlp: {w1, w2, w3}`` layout (stacked or not)."""

    def visit(node):
        if not isinstance(node, dict):
            return node
        if "w1" in node and "w2" in node and "w3" in node:
            w1, w2 = node["w1"], node["w2"]
            fused = {"kernel": jnp.concatenate([w1["kernel"], w2["kernel"]], axis=-1)}
            if w1.get("bias") is not None:
                fused["bias"] = jnp.concatenate([w1["bias"], w2["bias"]], axis=-1)
            else:
                fused["bias"] = None
            return {"w12": fused, "w3": node["w3"]}
        return {k: visit(v) for k, v in node.items()}

    return visit(params)


def param_count(params: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def tree_bytes(params: Any) -> int:
    return sum(int(p.size * p.dtype.itemsize) for p in jax.tree.leaves(params))
