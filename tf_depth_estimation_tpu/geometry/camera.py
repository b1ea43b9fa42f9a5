"""Camera intrinsics and pinhole projection.

Reference: ``utils_lr.py:151-220`` (pixel2cam / cam2pixel / meshgrid) and the intrinsics
pyramid builders in the data loaders (``imageselect_Dataloader_optflow.py:236-262``,
``Demon_Data_loader.py:14-39``).

TPU-first notes: all shapes static; the unprojection is expressed as a single batched
[3,3] @ [3, H*W] matmul (MXU), and the homogeneous grid is precomputed once per (H, W)
at trace time as a constant.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_intrinsics_matrix(fx, fy, cx, cy) -> jnp.ndarray:
    """Batched [.., 3, 3] K from focal lengths / principal point (ref loader helper)."""
    fx, fy, cx, cy = map(jnp.asarray, (fx, fy, cx, cy))
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zero, cx], axis=-1),
        jnp.stack([zero, fy, cy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def scale_intrinsics_pyramid(
    K: jnp.ndarray, num_scales: int, x_ratio: float = 1.0, y_ratio: float = 1.0
) -> jnp.ndarray:
    """[B, 3, 3] -> [B, num_scales, 3, 3], halving focal/principal per scale.

    Matches ``imageselect_Dataloader_optflow.py:248-262`` (including the resize-ratio
    correction applied when the loader resizes images before the pyramid is built).
    """
    ks = []
    for s in range(num_scales):
        f = 1.0 / (2.0**s)
        ks.append(
            make_intrinsics_matrix(
                K[..., 0, 0] * f * x_ratio,
                K[..., 1, 1] * f * y_ratio,
                K[..., 0, 2] * f * x_ratio,
                K[..., 1, 2] * f * y_ratio,
            )
        )
    return jnp.stack(ks, axis=-3)


def pixel_grid(height: int, width: int, homogeneous: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel-coordinate grid ``[2 or 3, H, W]`` (x, y[, 1]).

    The reference builds this via linspace matmuls per batch element
    (``utils_lr.py:196-220``); values are identical to a plain index grid, so here it is a
    trace-time numpy constant (no per-step compute, replicated by XLA as needed).
    """
    x = np.arange(width, dtype=np.float32)
    y = np.arange(height, dtype=np.float32)
    xg, yg = np.meshgrid(x, y)  # each [H, W]
    if homogeneous:
        grid = np.stack([xg, yg, np.ones_like(xg)], axis=0)
    else:
        grid = np.stack([xg, yg], axis=0)
    return jnp.asarray(grid, dtype=dtype)


def pixel_to_cam(
    depth: jnp.ndarray, K: jnp.ndarray, homogeneous: bool = True
) -> jnp.ndarray:
    """Unproject a depth map to camera-frame points.

    Args:
      depth: ``[B, H, W]`` metric depth.
      K: ``[B, 3, 3]`` intrinsics.
    Returns:
      ``[B, 3 (4), H, W]`` camera coordinates (homogeneous if requested).

    Reference: ``utils_lr.py:151-170`` — inv(K) @ pix * depth.  The inverse of the
    triangular K is computed in closed form instead of ``tf.matrix_inverse``.
    """
    B, H, W = depth.shape
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    sk = K[:, 0, 1]  # skew (zero in all reference data, supported for completeness)

    grid = pixel_grid(H, W)  # [3, H, W]
    xg, yg = grid[0], grid[1]
    # closed-form inv(K) applied to (x, y, 1), then scaled by depth
    y_cam = (yg[None] - cy[:, None, None]) / fy[:, None, None]
    x_cam = (
        xg[None] - cx[:, None, None] - sk[:, None, None] * y_cam
    ) / fx[:, None, None]
    pts = jnp.stack([x_cam * depth, y_cam * depth, depth], axis=1)  # [B, 3, H, W]
    if homogeneous:
        ones = jnp.ones((B, 1, H, W), dtype=depth.dtype)
        pts = jnp.concatenate([pts, ones], axis=1)
    return pts


def cam_to_pixel(cam_coords: jnp.ndarray, proj: jnp.ndarray, eps: float = 1e-10):
    """Project homogeneous camera points through a 4x4 projection.

    Args:
      cam_coords: ``[B, 4, H, W]``.
      proj: ``[B, 4, 4]`` (K4x4 @ T).
    Returns:
      (``[B, H, W, 2]`` pixel coords, ``[B, H, W, 1]`` projected z-buffer).

    Reference: ``utils_lr.py:172-194`` including the ``z + 1e-10`` division guard and the
    returned z-buffer used by the depth-consistency loss.
    """
    B, _, H, W = cam_coords.shape
    flat = cam_coords.reshape(B, 4, H * W)
    # one batched MXU matmul; HIGHEST precision keeps f32 on TPU (parity-critical path)
    unnorm = jnp.einsum("bij,bjn->bin", proj, flat, precision="highest")
    x_u, y_u, z_u = unnorm[:, 0], unnorm[:, 1], unnorm[:, 2]
    x_n = x_u / (z_u + eps)
    y_n = y_u / (z_u + eps)
    coords = jnp.stack([x_n, y_n], axis=-1).reshape(B, H, W, 2)
    return coords, z_u.reshape(B, H, W, 1)


def pad_intrinsics_4x4(K: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 3] K -> [B, 4, 4] (ref: filler rows in ``utils_lr.py:245-248``)."""
    B = K.shape[0]
    right = jnp.zeros((B, 3, 1), dtype=K.dtype)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=K.dtype), (B, 1, 4)
    )
    return jnp.concatenate([jnp.concatenate([K, right], axis=2), bottom], axis=1)
