"""Frechet distance machinery with sharded streaming statistics.

The reference computes FID on rank 0 from PNG folders
(tools/test_reconstruction_hf.py:98-176) — a single-device second pass.
Here activations are reduced to running moments *as they are produced*
(sum, X^T X, count), which shards trivially over a data mesh with a
``psum`` and never materializes the 50k x 2048 activation matrix; the
final mean/covariance and matrix sqrt run in fp64 on the host, exactly
matching the reference's numpy/scipy formula.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg


@dataclasses.dataclass
class FrechetStats:
    """Streaming first/second moments of feature activations."""

    dims: int
    total: np.ndarray = None  # (dims,) fp64
    outer: np.ndarray = None  # (dims, dims) fp64
    count: float = 0.0

    def __post_init__(self):
        if self.total is None:
            self.total = np.zeros((self.dims,), np.float64)
        if self.outer is None:
            self.outer = np.zeros((self.dims, self.dims), np.float64)

    def update(self, activations) -> None:
        """activations: (N, dims) — device or host array."""
        a = np.asarray(activations, np.float64)
        self.total += a.sum(axis=0)
        self.outer += a.T @ a
        self.count += a.shape[0]

    def merge(self, other: "FrechetStats") -> "FrechetStats":
        out = FrechetStats(self.dims)
        out.total = self.total + other.total
        out.outer = self.outer + other.outer
        out.count = self.count + other.count
        return out

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        """(mu, sigma) with the numpy sample covariance (ddof=1),
        matching ``np.cov(act, rowvar=False)``."""
        mu = self.total / self.count
        sigma = (self.outer - self.count * np.outer(mu, mu)) / (self.count - 1)
        return mu, sigma


@jax.jit
def activation_moments(activations: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Device-side partial moments for one batch — psum-able under pjit."""
    a = activations.astype(jnp.float32)
    return a.sum(0), a.T @ a, jnp.asarray(a.shape[0], jnp.float32)


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)), fp64 host sqrtm —
    same formula as the reference manual path
    (test_reconstruction_hf.py:168-176)."""
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_stats(stats1: FrechetStats, stats2: FrechetStats) -> float:
    mu1, s1 = stats1.finalize()
    mu2, s2 = stats2.finalize()
    return frechet_distance(mu1, s1, mu2, s2)
