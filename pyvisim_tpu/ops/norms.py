"""Normalization primitives shared by the encoder cores.

Implements the exact normalization semantics of the reference encoders:
signed power normalization followed by an L_p norm with an *additive*
epsilon in the denominator (reference: pyvisim/encoders/vlad.py:106-108,
pyvisim/encoders/fisher_vector.py:127-129).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["power_normalize", "lp_norm", "lp_normalize"]


def power_normalize(x: jnp.ndarray, power: float) -> jnp.ndarray:
    """Signed power normalization ``sign(x) * |x| ** power``.

    Matches reference pyvisim/encoders/vlad.py:106 /
    fisher_vector.py:127. ``power == 1`` is the identity and is
    special-cased so XLA drops the transcendental entirely.
    """
    if power == 1.0:
        return x
    if power == 0.5:
        # sqrt is much cheaper than pow on the VPU.
        return jnp.sign(x) * jnp.sqrt(jnp.abs(x))
    return jnp.sign(x) * jnp.abs(x) ** power


def lp_norm(x: jnp.ndarray, ord: float = 2.0, axis: int = -1, keepdims: bool = True):
    """Vector L_p norm along ``axis`` (``np.linalg.norm`` vector semantics)."""
    if ord == 2.0:
        return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))
    if ord == 1.0:
        return jnp.sum(jnp.abs(x), axis=axis, keepdims=keepdims)
    if ord == jnp.inf:
        return jnp.max(jnp.abs(x), axis=axis, keepdims=keepdims)
    return jnp.sum(jnp.abs(x) ** ord, axis=axis, keepdims=keepdims) ** (1.0 / ord)


def lp_normalize(
    x: jnp.ndarray, ord: float = 2.0, axis: int = -1, epsilon: float = 1e-9
) -> jnp.ndarray:
    """Divide by ``lp_norm(x) + epsilon``.

    The epsilon is *added to* the norm, never a clamp — this is the exact
    denominator the reference uses (vlad.py:107, fisher_vector.py:128), and
    parity tests depend on it (an all-zero row maps to an all-zero row).
    """
    return x / (lp_norm(x, ord=ord, axis=axis, keepdims=True) + epsilon)
