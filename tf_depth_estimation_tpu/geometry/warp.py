"""Differentiable warps: projective inverse warp, flow warp, depth consistency.

Reference: ``utils_lr.py:222-274`` (projective_inverse_warp / optflow_warp),
``utils_lr.py:369-458`` (consistent_depth_loss), ``utils_lr.py:472-489`` (depth_optflow).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tf_depth_estimation_tpu.geometry.camera import (
    cam_to_pixel,
    pad_intrinsics_4x4,
    pixel_grid,
    pixel_to_cam,
)
from tf_depth_estimation_tpu.geometry.pose import pose_vec_to_mat
from tf_depth_estimation_tpu.geometry.sampling import bilinear_sample


class WarpResult(NamedTuple):
    """Full output set of the inverse warp (superset of both reference signatures:
    ``utils.py:168-199`` returns 3 values, ``utils_lr.py:222-256`` returns 5)."""

    image: jnp.ndarray        # [B, H, W, C] source warped into the target frame
    coords: jnp.ndarray       # [B, H, W, 2] source-pixel coordinates
    mask: jnp.ndarray         # [B, H, W, 1] bilinear validity weight (wmask)
    warped_depth: jnp.ndarray  # [B, H, W, 1] z-buffer of the projected points
    pose: jnp.ndarray         # [B, 4, 4] the (possibly converted) pose matrix


def projective_inverse_warp(
    img: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    fmt: str = "euler",
    sampler: str = "xla",
) -> WarpResult:
    """Inverse-warp ``img`` (source view) into the target frame given target depth.

    Args:
      img: ``[B, H, W, C]`` source image.
      depth: ``[B, H, W]`` target-frame depth.
      pose: ``[B, 6]`` (tx ty tz rx ry rz) or ``[B, 4, 4]`` when ``fmt='matrix'``.
      intrinsics: ``[B, 3, 3]``.
      fmt: 'euler' | 'angleaxis' | 'matrix'.
      sampler: gather backend, see ``geometry.sampling.bilinear_sample`` — pass
        "pallas" in warp-dominated graphs (refine, standalone evaluation).

    Pipeline (ref ``utils_lr.py:222-256``): pose->matrix, unproject target pixels with
    depth, project into source with K4 @ T, bilinear-sample.
    """
    if fmt in ("euler", "eular", "angleaxis"):
        pose_mat = pose_vec_to_mat(pose, fmt)
    elif fmt == "matrix":
        pose_mat = pose
    else:
        raise ValueError(f"unknown pose format: {fmt}")

    cam_coords = pixel_to_cam(depth, intrinsics)                 # [B, 4, H, W]
    proj = pad_intrinsics_4x4(intrinsics) @ pose_mat             # [B, 4, 4]
    coords, warped_depth = cam_to_pixel(cam_coords, proj)
    out, wmask = bilinear_sample(img, coords, sampler=sampler)
    return WarpResult(out, coords, wmask, warped_depth, pose_mat)


def flow_warp(img: jnp.ndarray, flow_x: jnp.ndarray, flow_y: jnp.ndarray,
              sampler: str = "xla") -> jnp.ndarray:
    """Warp by adding a flow field to the identity grid (ref ``utils_lr.py:258-274``).

    ``flow_x/flow_y``: ``[B, H, W, 1]``.  ``sampler``: see ``bilinear_sample``.
    """
    B, H, W, _ = img.shape
    grid = pixel_grid(H, W, homogeneous=False)  # [2, H, W]
    coords = jnp.stack(
        [grid[0][None] + flow_x[..., 0], grid[1][None] + flow_y[..., 0]], axis=-1
    )
    out, _ = bilinear_sample(img, coords, sampler=sampler)
    return out


def flow_from_coords(src_coords: jnp.ndarray):
    """Source-pixel coords -> optical flow wrt the identity grid
    (ref ``depth_optflow``, ``utils_lr.py:472-489``).  Returns (flow_x, flow_y),
    each ``[B, H, W, 1]``."""
    B, H, W, _ = src_coords.shape
    grid = pixel_grid(H, W, homogeneous=False)
    fx = src_coords[..., 0:1] - grid[0][None, ..., None]
    fy = src_coords[..., 1:2] - grid[1][None, ..., None]
    return fx, fy


def resample_depth(src_depth: jnp.ndarray, coords: jnp.ndarray,
                   sampler: str = "xla") -> jnp.ndarray:
    """Bilinear-sample a (inverse) depth map of the other view at warped coords."""
    out, _ = bilinear_sample(src_depth, coords, sampler=sampler)
    return out


def consistent_depth_error(
    src_depth: jnp.ndarray, pred_src_depth: jnp.ndarray, coords: jnp.ndarray,
    sampler: str = "xla",
) -> jnp.ndarray:
    """|pred_src_depth - sample(src_depth, coords)| — left/right depth consistency
    (ref ``consistent_depth_loss``, ``utils_lr.py:369-458``)."""
    return jnp.abs(pred_src_depth - resample_depth(src_depth, coords,
                                                   sampler=sampler))
