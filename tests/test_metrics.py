"""Metric tests: formula checks vs torch, and an independent SSIM oracle.

The SSIM oracle below is a direct numpy transcription of the published SSIM
definition with skimage's defaults (7x7 uniform window, sample covariance,
K1=0.01/K2=0.03, border crop) — written independently of both skimage and our
jax implementation, so agreement is meaningful.
"""

import numpy as np
import pytest
import torch

from lrf_tpu.utils.metrics import (
    bits_per_pixel,
    compression_ratio,
    get_memory_usage,
    mae,
    mse,
    psnr,
    relative_error,
    ssim,
)

RNG = np.random.default_rng(11)


def _ssim_oracle(img1, img2, data_range, win=7):
    """Straightforward O(HW win^2) SSIM with uniform window, valid interior."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    vals = []
    for c in range(img1.shape[0]):
        x = img1[c].astype(np.float64)
        y = img2[c].astype(np.float64)
        h, w = x.shape
        out = np.empty((h - win + 1, w - win + 1))
        for i in range(h - win + 1):
            for j in range(w - win + 1):
                px = x[i : i + win, j : j + win]
                py = y[i : i + win, j : j + win]
                ux, uy = px.mean(), py.mean()
                vx = cov_norm * (np.mean(px * px) - ux * ux)
                vy = cov_norm * (np.mean(py * py) - uy * uy)
                vxy = cov_norm * (np.mean(px * py) - ux * uy)
                out[i, j] = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
                    (ux * ux + uy * uy + c1) * (vx + vy + c2)
                )
        vals.append(out.mean())
    return float(np.mean(vals))


class TestBasicMetrics:
    def test_psnr_matches_formula(self):
        a = RNG.integers(0, 256, (3, 16, 16)).astype(np.uint8)
        b = RNG.integers(0, 256, (3, 16, 16)).astype(np.uint8)
        expected = 20 * np.log10(
            255.0 / np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2))
        )
        assert abs(float(psnr(a, b)) - expected) < 1e-3

    def test_mse_mae(self):
        a = np.zeros((3, 4, 4), np.float32)
        b = np.full((3, 4, 4), 2.0, np.float32)
        assert float(mse(a, b)) == pytest.approx(4.0)
        assert float(mae(a, b)) == pytest.approx(2.0)

    def test_relative_error_matches_torch(self):
        a = RNG.standard_normal((3, 8, 8)).astype(np.float32)
        b = RNG.standard_normal((3, 8, 8)).astype(np.float32)
        expected = (
            torch.norm(torch.tensor(a - b), p=2, dim=(-3, -2, -1))
            / (torch.norm(torch.tensor(a), p=2, dim=(-3, -2, -1)) + 1e-16)
        ).item()
        assert abs(float(relative_error(a, b)) - expected) < 1e-5


class TestSSIM:
    @pytest.mark.parametrize("noise", [0, 10, 60])
    def test_matches_independent_oracle(self, noise):
        img1 = RNG.integers(0, 256, (3, 40, 48)).astype(np.uint8)
        img2 = np.clip(
            img1.astype(int) + RNG.integers(-noise, noise + 1, img1.shape), 0, 255
        ).astype(np.uint8)
        dr = float(img1.max()) - float(img1.min())
        expected = _ssim_oracle(img1, img2, dr)
        got = float(ssim(img1, img2))
        assert abs(got - expected) < 2e-4, (got, expected)

    def test_identical_images(self):
        img = RNG.integers(0, 256, (3, 32, 32)).astype(np.uint8)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


class TestRateMetrics:
    def test_memory_usage(self):
        obj = {"a": b"12345", "b": [np.zeros(10, np.int8), np.zeros(4, np.float32)]}
        assert get_memory_usage(obj) == 5 + 10 + 16

    def test_compression_ratio_and_bpp(self):
        img = np.zeros((3, 10, 10), np.uint8)
        blob = b"x" * 30
        assert compression_ratio(img, blob) == pytest.approx(10.0)
        assert bits_per_pixel(img.shape[-2:], blob) == pytest.approx(2.4)
