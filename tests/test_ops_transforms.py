"""Unit tests for the transform core: color, resample, pad, patchify.

Each transform is validated against torch's implementation of the same
operation (the behaviors the reference relies on) and for inverse round-trip
properties. SURVEY.md §4: the reference has no such tests; these are new.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from lrf_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
from lrf_tpu.ops.pad import pad_image, unpad_image
from lrf_tpu.ops.patch import depatchify, depatchify_uv, patchify, patchify_uv
from lrf_tpu.ops.resample import (
    area_resize,
    chroma_downsample,
    chroma_upsample,
    nearest_resize,
    scaled_size,
)

RNG = np.random.default_rng(0)


class TestColor:
    def test_roundtrip(self):
        img = RNG.integers(0, 256, (3, 32, 48)).astype(np.float32)
        out = ycbcr_to_rgb(rgb_to_ycbcr(jnp.asarray(img)))
        np.testing.assert_allclose(np.asarray(out), img, atol=2e-3)

    def test_matches_reference_matrices(self):
        # Exact BT.601 forward transform vs a direct torch einsum with the
        # reference constants (lrf/compression/utils.py:35).
        img = RNG.integers(0, 256, (3, 16, 16)).astype(np.float32)
        m = torch.tensor(
            [
                [0.299, 0.587, 0.114],
                [-0.168736, -0.331264, 0.5],
                [0.5, -0.418688, -0.081312],
            ]
        )
        offset = torch.tensor([0.0, 128.0, 128.0]).view(3, 1, 1)
        expected = offset + torch.einsum("ij,jhw->ihw", m, torch.tensor(img))
        got = np.asarray(rgb_to_ycbcr(jnp.asarray(img)))
        np.testing.assert_allclose(got, expected.numpy(), atol=1e-4)

    def test_batched(self):
        img = RNG.integers(0, 256, (5, 3, 8, 8)).astype(np.float32)
        out = np.asarray(rgb_to_ycbcr(jnp.asarray(img)))
        one = np.asarray(rgb_to_ycbcr(jnp.asarray(img[2])))
        np.testing.assert_allclose(out[2], one, atol=1e-5)


class TestResample:
    @pytest.mark.parametrize("size", [(16, 24), (17, 23), (31, 9)])
    @pytest.mark.parametrize("scale", [(0.5, 0.5), (0.25, 0.5)])
    def test_area_downsample_matches_torch(self, size, scale):
        x = RNG.standard_normal((1, 1, *size)).astype(np.float32)
        expected = F.interpolate(torch.tensor(x), scale_factor=scale, mode="area")
        out_size = scaled_size(size, scale)
        got = np.asarray(area_resize(jnp.asarray(x[0]), out_size))
        np.testing.assert_allclose(got, expected.numpy()[0], atol=1e-5)

    @pytest.mark.parametrize("in_size,out_size", [((8, 12), (16, 24)), ((7, 9), (13, 21))])
    def test_nearest_upsample_matches_torch(self, in_size, out_size):
        x = RNG.standard_normal((1, 1, *in_size)).astype(np.float32)
        expected = F.interpolate(torch.tensor(x), size=out_size, mode="nearest")
        got = np.asarray(nearest_resize(jnp.asarray(x[0]), out_size))
        np.testing.assert_allclose(got, expected.numpy()[0], atol=0)

    @pytest.mark.parametrize("in_size,out_size", [((8, 12), (16, 24)), ((7, 9), (14, 18))])
    def test_area_upsample_matches_torch(self, in_size, out_size):
        # SVD decode path uses area-mode upsampling (compression/svd.py:356).
        x = RNG.standard_normal((1, 1, *in_size)).astype(np.float32)
        expected = F.interpolate(torch.tensor(x), size=out_size, mode="area")
        got = np.asarray(area_resize(jnp.asarray(x[0]), out_size))
        np.testing.assert_allclose(got, expected.numpy()[0], atol=1e-6)

    def test_chroma_roundtrip_shapes(self):
        img = RNG.standard_normal((3, 34, 50)).astype(np.float32)
        y, cb, cr = chroma_downsample(jnp.asarray(img))
        assert y.shape == (1, 34, 50)
        assert cb.shape == (1, 17, 25)
        restacked = chroma_upsample((y, cb, cr), size=(34, 50), mode="nearest")
        assert restacked.shape == (3, 34, 50)
        np.testing.assert_allclose(np.asarray(restacked[0]), img[0], atol=0)


class TestPad:
    @pytest.mark.parametrize("size", [(30, 41), (32, 40), (9, 9), (8, 17)])
    def test_matches_torch_reflect(self, size):
        x = RNG.standard_normal((1, *size)).astype(np.float32)
        p, q = 8, 8
        pad_h = (p - size[0] % p) % p
        pad_w = (q - size[1] % q) % q
        expected = F.pad(
            torch.tensor(x),
            (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2),
            mode="reflect",
        )
        got = np.asarray(pad_image(jnp.asarray(x), (p, q)))
        np.testing.assert_allclose(got, expected.numpy(), atol=0)

    @pytest.mark.parametrize("size", [(30, 41), (32, 40), (3, 5)])
    def test_roundtrip(self, size):
        x = RNG.standard_normal((2, *size)).astype(np.float32)
        padded = pad_image(jnp.asarray(x), (8, 8))
        assert padded.shape[-2] % 8 == 0 and padded.shape[-1] % 8 == 0
        back = unpad_image(padded, size)
        np.testing.assert_allclose(np.asarray(back), x, atol=0)


class TestPatchify:
    @pytest.mark.parametrize("c", [1, 3])
    def test_matches_einops(self, c):
        from einops import rearrange

        x = RNG.standard_normal((c, 24, 32)).astype(np.float32)
        expected = rearrange(torch.tensor(x), "c (h p) (w q) -> (h w) (c p q)", p=8, q=8)
        got = np.asarray(patchify(jnp.asarray(x), (8, 8)))
        np.testing.assert_allclose(got, expected.numpy(), atol=0)

    def test_roundtrip(self):
        x = RNG.standard_normal((3, 24, 32)).astype(np.float32)
        m = patchify(jnp.asarray(x), (8, 8))
        back = depatchify(m, (24, 32), (8, 8))
        np.testing.assert_allclose(np.asarray(back), x, atol=0)

    def test_roundtrip_batched(self):
        x = RNG.standard_normal((4, 3, 16, 16)).astype(np.float32)
        m = patchify(jnp.asarray(x), (8, 8))
        assert m.shape == (4, 4, 192)
        back = depatchify(m, (16, 16), (8, 8))
        np.testing.assert_allclose(np.asarray(back), x, atol=0)

    def test_uv_roundtrip(self):
        u = RNG.standard_normal((12, 5)).astype(np.float32)  # (h*w, R)
        v = RNG.standard_normal((192, 5)).astype(np.float32)  # (c*p*q, R)
        u_map, v_map = depatchify_uv(jnp.asarray(u), jnp.asarray(v), (24, 32), (8, 8))
        assert u_map.shape == (5, 1, 3, 4)
        assert v_map.shape == (5, 3, 8, 8)
        u2, v2 = patchify_uv(u_map, v_map)
        np.testing.assert_allclose(np.asarray(u2), u, atol=0)
        np.testing.assert_allclose(np.asarray(v2), v, atol=0)

    def test_uv_matches_einops(self):
        from einops import rearrange

        u = torch.randn(12, 5)
        v = torch.randn(192, 5)
        eu = rearrange(u, "(h w) r -> r 1 h w", h=3)
        ev = rearrange(v, "(c p q) r -> r c p q", p=8, q=8)
        gu, gv = depatchify_uv(jnp.asarray(u.numpy()), jnp.asarray(v.numpy()), (24, 32), (8, 8))
        np.testing.assert_allclose(np.asarray(gu), eu.numpy(), atol=0)
        np.testing.assert_allclose(np.asarray(gv), ev.numpy(), atol=0)
