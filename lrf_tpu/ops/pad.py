"""Reflect padding to patch multiples, and its centered-crop inverse.

TPU-native equivalent of the reference pad/unpad pair
(`lrf/compression/utils.py:108-153` in pashtari/lrf): pad H and W up to the
next multiple of the patch size, split evenly top/bottom and left/right
(extra pixel goes to the bottom/right), reflect mode (edge pixel not
duplicated, like `torch.nn.functional.pad(mode="reflect")`).
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_amounts(size: tuple[int, int], patch_size: tuple[int, int]):
    """(top, bottom, left, right) padding; reference `pad_image` split rule."""
    h, w = size
    p, q = patch_size
    pad_h = (p - h % p) % p
    pad_w = (q - w % q) % q
    top = pad_h // 2
    bottom = pad_h - top
    left = pad_w // 2
    right = pad_w - left
    return top, bottom, left, right


def pad_image(x: jnp.ndarray, patch_size: tuple[int, int]) -> jnp.ndarray:
    """Reflect-pad `(..., H, W)` so H, W become multiples of `patch_size`."""
    top, bottom, left, right = pad_amounts((x.shape[-2], x.shape[-1]), patch_size)
    if (top, bottom, left, right) == (0, 0, 0, 0):
        return x
    pad_width = [(0, 0)] * (x.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(x, pad_width, mode="reflect")


def unpad_image(x: jnp.ndarray, orig_size: tuple[int, int]) -> jnp.ndarray:
    """Centered crop back to `orig_size`; reference `unpad_image` semantics."""
    h_pad, w_pad = x.shape[-2], x.shape[-1]
    h, w = orig_size
    start_h = (h_pad - h) // 2
    start_w = (w_pad - w) // 2
    return x[..., start_h : start_h + h, start_w : start_w + w]
