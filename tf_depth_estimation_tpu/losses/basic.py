"""Elementary loss terms shared by the experiment pipelines."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def second_order_smoothness(pred: jnp.ndarray) -> jnp.ndarray:
    """Mean |dxx| + |dxdy| + |dydx| + |dyy| of a [B, H, W, C] prediction.

    Reference ``compute_smooth_loss`` (``my_losses.py:27-36`` and per-script copies):
    second-order, NOT edge-aware.  Note |dxdy| and |dydx| are the same tensor up to
    operand order; the reference sums both, so we do too.
    """
    dy = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    dx = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    dx2 = dx[:, :, 1:, :] - dx[:, :, :-1, :]
    dxdy = dx[:, 1:, :, :] - dx[:, :-1, :, :]
    dydx = dy[:, :, 1:, :] - dy[:, :, :-1, :]
    dy2 = dy[:, 1:, :, :] - dy[:, :-1, :, :]
    return (
        jnp.mean(jnp.abs(dx2))
        + jnp.mean(jnp.abs(dxdy))
        + jnp.mean(jnp.abs(dydx))
        + jnp.mean(jnp.abs(dy2))
    )


def reference_explain_mask(batch: int, height: int, width: int, scale: int) -> jnp.ndarray:
    """All-[0,1] reference mask for the explainability regularizer
    (``my_losses.py:14-23``): [B, H/2^s, W/2^s, 2]."""
    h, w = int(height / 2**scale), int(width / 2**scale)
    m = jnp.broadcast_to(jnp.array([0.0, 1.0]), (batch, h, w, 2))
    return m


def explain_reg_loss(logits: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross-entropy of mask logits against the reference mask
    (``my_losses.py:39-43``)."""
    logp = jax.nn.log_softmax(logits.reshape(-1, 2), axis=-1)
    return -jnp.mean(jnp.sum(ref.reshape(-1, 2) * logp, axis=-1))


def si_log_rmse(label: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """'Scale-invariant' log RMSE as the reference defines it:
    sqrt(mean(d^2) + mean(d)^2), d = log(label) - log(pred)
    (validation metric, ``train_depth_only.py:248-249``).

    Note the ``+``: the standard Eigen et al. metric subtracts the squared mean; the
    reference *adds* it, so its metric still penalizes global scale error.  Reproduced
    verbatim for parity.
    """
    d = jnp.log(label) - jnp.log(pred)
    return jnp.sqrt(jnp.mean(d * d) + jnp.mean(d) ** 2)
