"""Small numeric helpers shared by the factorization kernels.

Equivalents of `lrf/factorization/utils.py` in pashtari/lrf, as pure jnp
functions (jittable, batch-broadcasting).
"""

from __future__ import annotations

import jax.numpy as jnp


def prod(x) -> int:
    """Product of an iterable of ints (`factorization/utils.py:8`)."""
    out = 1
    for v in x:
        out *= v
    return out


def relative_error(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """Frobenius relative error over the last two dims (`factorization/utils.py:12`)."""
    num = jnp.sqrt(jnp.sum((x - y) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(x**2, axis=(-2, -1)))
    return num / (den + eps)


def safe_divide(num: jnp.ndarray, den: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """Division with sign-preserving epsilon guard (`factorization/utils.py:18`)."""
    small = jnp.abs(den) < eps
    adjusted = jnp.where(small, eps * jnp.sign(den), den)
    return num / adjusted


def soft_thresholding(x: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Soft-threshold operator (`factorization/utils.py:36`); identity at 0."""
    if threshold == 0:
        return x
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - threshold, 0.0)
