"""Metrics: PSNR/SSIM/FID against independent oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from vtp_tpu.metrics import FrechetStats, fid_from_stats, frechet_distance, psnr, ssim


def test_psnr_matches_reference_formula(rng):
    a = rng.uniform(0, 255, (4, 3, 32, 32)).astype(np.float32)
    b = rng.uniform(0, 255, (4, 3, 32, 32)).astype(np.float32)
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    for i in range(4):
        mse = np.mean((a[i] - b[i]) ** 2)
        want = 20 * np.log10(255.0 / np.sqrt(mse))
        np.testing.assert_allclose(got[i], want, rtol=1e-5)
    assert np.isinf(np.asarray(psnr(jnp.asarray(a), jnp.asarray(a)))).all()


def _ssim_numpy(x, y, data_range=1.0):
    """Independent direct implementation (valid windows, gaussian 11/1.5)."""
    from scipy.signal import convolve2d

    size, sigma = 11, 1.5
    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    k = np.outer(g, g)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def f(img):
        return convolve2d(img, k, mode="valid")

    vals = []
    for b in range(x.shape[0]):
        for c in range(x.shape[1]):
            xi, yi = x[b, c], y[b, c]
            mx, my = f(xi), f(yi)
            sx = f(xi * xi) - mx * mx
            sy = f(yi * yi) - my * my
            sxy = f(xi * yi) - mx * my
            m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
                (mx * mx + my * my + c1) * (sx + sy + c2)
            )
            vals.append(m.mean())
    return np.mean(vals)


def test_ssim_matches_numpy(rng):
    x = rng.uniform(0, 1, (2, 3, 48, 48)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = _ssim_numpy(x, y)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999


def test_streaming_fid_matches_direct(rng):
    a = rng.normal(0, 1, (500, 16)).astype(np.float32)
    b = rng.normal(0.3, 1.2, (400, 16)).astype(np.float32)

    sa, sb = FrechetStats(16), FrechetStats(16)
    for chunk in np.array_split(a, 7):
        sa.update(chunk)
    for chunk in np.array_split(b, 5):
        sb.update(chunk)
    got = fid_from_stats(sa, sb)

    mu1, s1 = a.mean(0).astype(np.float64), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0).astype(np.float64), np.cov(b, rowvar=False)
    from scipy import linalg

    covmean = linalg.sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    want = np.sum((mu1 - mu2) ** 2) + np.trace(s1 + s2 - 2 * covmean)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical distributions -> ~0
    assert abs(fid_from_stats(sa, sa)) < 1e-6


def test_frechet_merge(rng):
    a = rng.normal(0, 1, (300, 8)).astype(np.float32)
    s1, s2, s_all = FrechetStats(8), FrechetStats(8), FrechetStats(8)
    s1.update(a[:100])
    s2.update(a[100:])
    s_all.update(a)
    merged = s1.merge(s2)
    mu_m, cov_m = merged.finalize()
    mu_a, cov_a = s_all.finalize()
    np.testing.assert_allclose(mu_m, mu_a, rtol=1e-10)
    np.testing.assert_allclose(cov_m, cov_a, rtol=1e-8)
