"""Scale-invariant gradient images and the robust pointwise L2 loss.

TPU-native equivalents of the two DeMoN-ecosystem natives the reference calls in its
losses (SURVEY §2.5):

- ``lmbspecialops.scale_invariant_gradient`` (C++/CUDA; used at ``my_losses.py:80-81``,
  ``my_losses_pairtest.py:59-60``): multi-delta forward differences normalized by the
  local magnitude sum, from the DeMoN paper (Ummenhofer et al., §4.1):

      g_d[f](i,j) = ( f(i+d,j) - f(i,j),  f(i,j+d) - f(i,j) )
                    / (|f(i+d,j)| + |f(i,j)| + eps)   [resp. j+d]

  with the difference defined as 0 where i+d (j+d) leaves the image, scaled by a
  per-delta weight, and all deltas stacked along the channel axis.

- ``tfutils.pointwise_l2_loss`` (DeMoN python): mean over pixels of
  ``sqrt(sum_c (pred-gt)^2 + eps)``.

Everything here is plain elementwise math on static shapes — XLA fuses the shifts,
normalization, and the downstream L2 into one VPU loop; no kernel needed.

Layout: NHWC (the reference transposes to NCHW solely because lmbspecialops demands it;
we skip the round-trip transposes entirely).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _shifted_diff(f: jnp.ndarray, delta: int, axis: int, eps: float):
    """(f(x+d) - f(x)) / (|f(x+d)| + |f(x)| + eps), zero where x+d is out of range.

    ``f``: [B, H, W, C]; axis 1 (y) or 2 (x).
    """
    n = f.shape[axis]
    d = min(delta, n)  # degenerate tiny images: everything out of range
    fwd = jnp.roll(f, -d, axis=axis)  # rolled; wrapped region masked out below
    num = fwd - f
    den = jnp.abs(fwd) + jnp.abs(f) + eps
    g = num / den
    # zero out positions where x + delta >= n
    idx = jnp.arange(n)
    valid = (idx + delta) < n
    shape = [1, 1, 1, 1]
    shape[axis] = n
    return g * valid.reshape(shape).astype(f.dtype)


def scale_invariant_gradient(
    f: jnp.ndarray,
    deltas: Sequence[int] = (1, 2, 4, 8, 16),
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
    epsilon: float = 0.001,
) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W, 2 * len(deltas) * C] stacked (gx, gy) per delta.

    Channel order per delta d: (w_d * gx, w_d * gy), deltas in the given order — matching
    lmbspecialops' stacking (its NCHW output ``[B, 2*len(deltas), H, W]`` transposed).
    """
    if len(deltas) != len(weights):
        raise ValueError("deltas and weights must have equal length")
    outs = []
    for d, w in zip(deltas, weights):
        gx = _shifted_diff(f, d, axis=2, eps=epsilon)
        gy = _shifted_diff(f, d, axis=1, eps=epsilon)
        outs.append(w * gx)
        outs.append(w * gy)
    return jnp.concatenate(outs, axis=-1)


def pointwise_l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """mean_pixels sqrt(sum_channels (pred-gt)^2 + eps) — DeMoN's robust L2."""
    d = pred - gt
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + epsilon))
