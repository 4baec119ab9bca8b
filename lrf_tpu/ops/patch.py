"""Patch-map reshapers: image <-> stacked flattened patches and factor maps.

TPU-native equivalents of the reference einops rearranges
(`lrf/compression/qmf.py:43-113` in pashtari/lrf):

- `patchify`:  ``c (h p) (w q) -> (h w) (c p q)``
- `depatchify`: its inverse
- `patchify_uv` / `depatchify_uv`: factor-map <-> factor-matrix reshapers used
  for visualization of QMF components.

Implemented as reshape+transpose so XLA lowers them to pure layout changes
(frequently fused away entirely). All shapes static; jittable; batch
dimensions broadcast on the left.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch_size: tuple[int, int]) -> jnp.ndarray:
    """`(..., C, H, W) -> (..., H/p * W/q, C*p*q)` stacked flattened patches."""
    p, q = patch_size
    *b, c, hh, ww = x.shape
    h, w = hh // p, ww // q
    x = x.reshape(*b, c, h, p, w, q)
    # (..., c, h, p, w, q) -> (..., h, w, c, p, q)
    nd = len(b)
    perm = tuple(range(nd)) + (nd + 1, nd + 3, nd, nd + 2, nd + 4)
    x = x.transpose(perm)
    return x.reshape(*b, h * w, c * p * q)


def depatchify(
    x: jnp.ndarray, size: tuple[int, int], patch_size: tuple[int, int]
) -> jnp.ndarray:
    """Inverse of `patchify`; `size` is the (padded) image (H, W)."""
    p, q = patch_size
    *b, hw, cpq = x.shape
    h, w = size[0] // p, size[1] // q
    c = cpq // (p * q)
    x = x.reshape(*b, h, w, c, p, q)
    nd = len(b)
    perm = tuple(range(nd)) + (nd + 2, nd, nd + 3, nd + 1, nd + 4)
    x = x.transpose(perm)  # (..., c, h, p, w, q)
    return x.reshape(*b, c, h * p, w * q)


def patchify_uv(u: jnp.ndarray, v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factor maps -> factor matrices (`lrf/compression/qmf.py:78`).

    u: `(R, 1, h, w) -> (h*w, R)`;  v: `(R, C, p, q) -> (C*p*q, R)`.
    """
    r, _, h, w = u.shape
    u_new = u.reshape(r, h * w).T
    rv, c, p, q = v.shape
    v_new = v.reshape(rv, c * p * q).T
    return u_new, v_new


def depatchify_uv(
    u: jnp.ndarray,
    v: jnp.ndarray,
    size: tuple[int, int],
    patch_size: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factor matrices -> spatial factor maps (`lrf/compression/qmf.py:95`).

    u: `(h*w, R) -> (R, 1, h, w)`;  v: `(C*p*q, R) -> (R, C, p, q)`.
    """
    p, q = patch_size
    h = size[0] // p
    hw, r = u.shape
    w = hw // h
    u_new = u.T.reshape(r, 1, h, w)
    cpq, rv = v.shape
    c = cpq // (p * q)
    v_new = v.T.reshape(rv, c, p, q)
    return u_new, v_new
