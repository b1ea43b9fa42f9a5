"""6-DoF pose parameterizations -> homogeneous 4x4 transforms.

Reference: ``utils_lr.py:106-149`` (`pose_vec2mat` with formats 'eular'/'angleaxis'/'test')
and the euler-only variant ``utils.py:79-98``.
"""
from __future__ import annotations

import jax.numpy as jnp

from tf_depth_estimation_tpu.geometry.rotations import euler_to_matrix, rotvec_to_matrix


def pose_vec_to_mat(vec: jnp.ndarray, fmt: str = "euler") -> jnp.ndarray:
    """[..., 6] pose ``[tx ty tz rx ry rz]`` -> [..., 4, 4] homogeneous transform.

    ``fmt``:
      - ``'euler'``      — rotation from Euler angles (reference format 'eular',
                           ``utils_lr.py:119-124``: note argument order euler2mat(rz, ry, rx)).
      - ``'angleaxis'``  — last three entries are an unnormalized rotation vector
                           (``utils_lr.py:126-134``).
      - ``'identity'``   — identity rotation/zero translation (reference format 'test').
    """
    t = vec[..., 0:3]
    if fmt in ("euler", "eular"):
        R = euler_to_matrix(vec[..., 5], vec[..., 4], vec[..., 3])
    elif fmt == "angleaxis":
        R = rotvec_to_matrix(vec[..., 3:6])
    elif fmt in ("identity", "test"):
        R = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), vec.shape[:-1] + (3, 3))
        t = jnp.zeros_like(t)
    else:
        raise ValueError(f"unknown pose format: {fmt}")

    top = jnp.concatenate([R, t[..., None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype), vec.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 transform (cheaper + better conditioned than
    the general ``matrix_inverse`` the reference calls at e.g. ``my_losses.py:166``)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
