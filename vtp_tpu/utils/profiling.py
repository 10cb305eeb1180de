"""Profiling & timing utilities.

The reference ships no tracing/profiling (SURVEY.md section 5.1 — only
tqdm bars and a flops estimator). Here: ``jax.profiler`` trace capture
around arbitrary callables, steady-state timing with dispatch-chaining
(the remote TPU runtime dedupes identical dispatches, so benchmarks
must thread a data dependency), and an analytic per-image FLOPs
estimator for the model family (PatchEmbed.flops-style, embeddings.py:72-77,
extended to full towers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vtp_tpu_trace"):
    """Capture a profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    chain: Optional[Callable] = None,
) -> float:
    """Mean seconds/call of a jitted ``fn(*args)``.

    ``chain(out) -> scalar``: when given, the scalar is fed back as the
    last positional arg of the next call, forcing each dispatch to
    depend on the previous result (defeats runtime dedup caching).
    """
    # NOTE: ``jax.block_until_ready`` is a no-op through the axon tunnel —
    # only a host fetch synchronizes. Every timing below therefore ends
    # with ``float(...)`` on a scalar derived from the final output.
    def _sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))

    if chain is not None:
        carry = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            out = fn(*args, carry)
            carry = chain(out)
        _sync(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, carry)
            carry = chain(out)
        _sync(carry)
        return (time.perf_counter() - t0) / iters

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def compiled_stats(fn: Callable, *args) -> dict:
    """FLOPs / bytes-accessed estimates from XLA's cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mb": (cost.get("bytes accessed") or 0) / 1e6,
    }
