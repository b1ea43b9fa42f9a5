"""Batched rotation parameterizations.

Covers the rotation math of the reference geometry library (``utils_lr.py:26-103`` and the
euler-only twin in ``utils.py:26-98``), redesigned as pure-jnp batched closed forms: no
concat-of-slices matrix assembly, just stacked elementwise trig — XLA fuses the whole thing
into a handful of VPU ops.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def euler_to_matrix(z: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (radians) -> rotation matrices, R = Rx @ Ry @ Rz.

    Matches the composition order of the reference (``utils_lr.py:73``:
    ``rotMat = xmat @ ymat @ zmat``), including the clip of each angle to [-pi, pi]
    (``utils_lr.py:40-42``).

    Args:
      z, y, x: angle arrays of identical shape ``[...]``.
    Returns:
      ``[..., 3, 3]`` rotation matrices.
    """
    z = jnp.clip(z, -np.pi, np.pi)
    y = jnp.clip(y, -np.pi, np.pi)
    x = jnp.clip(x, -np.pi, np.pi)

    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)

    # Closed form of Rx(x) @ Ry(y) @ Rz(z) with the reference's individual-axis conventions
    # (Rz = [[c,-s,0],[s,c,0],[0,0,1]], Ry = [[c,0,s],[0,1,0],[-s,0,c]],
    #  Rx = [[1,0,0],[0,c,-s],[0,s,c]]).
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation from a (unit) axis and angle.

    Reference: ``utils_lr.py:77-103`` builds the cross-product matrix and applies
    ``I + sin(a) K + (1 - cos(a)) K^2``.  Same math here, batched.

    Args:
      axis: ``[..., 3]`` unit rotation axes.
      angle: ``[...]`` rotation angles (radians).
    Returns:
      ``[..., 3, 3]`` rotation matrices.
    """
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    t = 1.0 - c
    # Closed form of I + s K + (1-c) K^2 with K the cross-product matrix of the axis:
    # K^2 = a a^T - (a.a) I.  Written elementwise (no 3x3 matmul) so XLA keeps it on the
    # VPU in full f32 — a K @ K under TPU default matmul precision would round to bf16.
    aa = ax * ax + ay * ay + az * az  # == 1 for unit axes; kept for exact ref parity
    rows = [
        jnp.stack([1.0 + t * (ax * ax - aa), t * ax * ay - s * az, t * ax * az + s * ay], axis=-1),
        jnp.stack([t * ax * ay + s * az, 1.0 + t * (ay * ay - aa), t * ay * az - s * ax], axis=-1),
        jnp.stack([t * ax * az - s * ay, t * ay * az + s * ax, 1.0 + t * (az * az - aa)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotvec_to_matrix(rotvec: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unnormalized rotation vector (angle * axis) -> rotation matrix.

    The reference extracts ``angle = |v|`` then divides (``utils_lr.py:128-133``) with no
    zero-angle guard; here a tiny epsilon keeps the gradient finite at v = 0 (documented
    divergence — the reference NaNs there).
    """
    sq = jnp.sum(rotvec * rotvec, axis=-1)
    # double-where keeps both value AND gradient finite at rotvec = 0 (sqrt'(0) = inf)
    safe_sq = jnp.where(sq > eps, sq, jnp.ones_like(sq))
    angle = jnp.where(sq > eps, jnp.sqrt(safe_sq), jnp.zeros_like(sq))
    axis = rotvec / jnp.where(sq > eps, angle, jnp.ones_like(angle))[..., None]
    return axis_angle_to_matrix(axis, angle)


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-12):
    """Rotation matrix -> (axis, angle).  Numpy twin lives in colmap.io for host tooling."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    angle = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    axis = v / (2.0 * jnp.sin(angle)[..., None] + eps)
    return axis, angle
