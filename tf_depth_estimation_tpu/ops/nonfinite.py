"""Non-finite replacement with gradient masking.

TPU-native equivalent of the C++/CUDA ``lmbspecialops.replace_nonfinite`` op the reference
uses to guard losses against NaN/Inf labels (``my_losses.py:87,211``,
``split_training.py:284``).  The lmbspecialops op replaces non-finite *values* with a
constant and zeroes the *gradient* at those sites.  A custom VJP locks both halves of that
contract (a naive ``where(isfinite(x), x, 0)`` forward is equivalent, but the explicit VJP
also kills any NaN cotangents arriving *at* masked sites, which ``where`` alone would
propagate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def replace_nonfinite(x: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """Replace NaN/±Inf entries of ``x`` with ``value``; gradient is zero there."""
    return jnp.where(jnp.isfinite(x), x, jnp.asarray(value, dtype=x.dtype))


def _fwd(x, value=0.0):
    mask = jnp.isfinite(x)
    return jnp.where(mask, x, jnp.asarray(value, dtype=x.dtype)), mask


def _bwd(mask, g):
    return (jnp.where(mask, g, jnp.zeros_like(g)), None)


replace_nonfinite.defvjp(_fwd, _bwd)
