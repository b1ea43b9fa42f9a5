"""TF1-legacy image resizes, reformulated as separable matmuls for the MXU.

The reference leans on TF1's *legacy* resize semantics everywhere — decoder disp upsampling
(``nets_optflow_depth.py:124,131,138``), per-scale loss pyramids via ``resize_area``
(``my_losses.py:74``), and nearest-neighbor ``resize_like`` shape patches
(``nets_optflow_depth.py:11-16``).  Those semantics (align_corners=False, *no* half-pixel
centers: ``src = dst * in/out``) differ from ``jax.image.resize``, and BASELINE requires
abs-rel parity, so they are rebuilt here exactly.

TPU-first design: every resize is separable with *static* shapes, so each one becomes two
dense matmuls with trace-time-constant weight matrices:  ``out = W_h @ img @ W_w^T``.
That runs on the MXU at full throughput instead of the gather/scatter lowering a direct
translation would produce, and it is exact (each row of W holds the 1-2 bilinear taps or
the fractional area coverage).  Gradients are just the transposed matmuls — XLA derives
them for free.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] TF1 align_corners=False bilinear weights (src = dst * in/out)."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        frac = src - lo
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        W[i, lo] += 1.0 - frac
        W[i, hi] += frac
    return W


@lru_cache(maxsize=None)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] TF1 ``resize_area`` weights: mean over [i*s, (i+1)*s) with fractional
    edge coverage, normalized by the box size."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        left = i * scale
        right = (i + 1) * scale
        lo = int(np.floor(left))
        hi = int(np.ceil(right))
        for j in range(lo, hi):
            cover = min(right, j + 1) - max(left, j)
            W[i, min(j, in_size - 1)] += cover
        W[i] /= scale
    return W


@lru_cache(maxsize=None)
def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] TF1 ``resize_nearest_neighbor`` (align_corners=False) selection matrix."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = min(int(np.floor(i * scale)), in_size - 1)
        W[i, src] = 1.0
    return W


def _apply_separable(img: jnp.ndarray, Wh: np.ndarray, Ww: np.ndarray) -> jnp.ndarray:
    """out[b,i,j,c] = sum_{y,x} Wh[i,y] Ww[j,x] img[b,y,x,c] — two MXU matmuls."""
    Wh = jnp.asarray(Wh, dtype=img.dtype)
    Ww = jnp.asarray(Ww, dtype=img.dtype)
    # [B,H,W,C] -> rows: [out_h, H] @ ... via einsum; XLA maps both contractions to MXU.
    # HIGHEST precision keeps f32 accumulate on TPU — these feed parity-checked losses.
    tmp = jnp.einsum("iy,byxc->bixc", Wh, img, precision="highest")
    return jnp.einsum("jx,bixc->bijc", Ww, tmp, precision="highest")


def _resize(img: jnp.ndarray, size, weight_fn) -> jnp.ndarray:
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = img.shape
    if (H, W) == (out_h, out_w):
        return img
    return _apply_separable(img, weight_fn(H, out_h), weight_fn(W, out_w))


def _up2_bilinear_axis(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact TF1 x2 bilinear along one spatial axis as a stencil (no matmul).

    align_corners=False with scale 0.5: out[2k] = in[k]; out[2k+1] = (in[k]+in[k+1])/2
    with the last tap clamped — exactly the rows of ``_bilinear_weights(n, 2n)``.
    """
    last = jax.lax.slice_in_dim(img, img.shape[axis] - 1, img.shape[axis], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(img, 1, img.shape[axis], axis=axis), last], axis=axis
    )
    odd = 0.5 * (img + nxt)
    stacked = jnp.stack([img, odd], axis=axis + 1)  # interleave even/odd
    new_shape = list(img.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)


def resize_bilinear(img: jnp.ndarray, size) -> jnp.ndarray:
    """TF1 ``tf.image.resize_bilinear(align_corners=False)`` parity. img: [B,H,W,C].

    Exact-x2 upsamples (the decoder's disp feedback path,
    ``nets_optflow_depth.py:124,131,138``) take a stencil fast path — full precision, no
    matmul; everything else runs as separable MXU matmuls.
    """
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = img.shape
    if (H, W) == (out_h, out_w):
        return img
    if out_h == 2 * H and out_w == 2 * W:
        return _up2_bilinear_axis(_up2_bilinear_axis(img, 1), 2)
    return _resize(img, size, _bilinear_weights)


def resize_area(img: jnp.ndarray, size) -> jnp.ndarray:
    """TF1 ``tf.image.resize_area`` parity (used for all loss pyramids).

    Integer downscale factors reduce to exact average pooling (reshape + mean — pure VPU);
    fractional ratios fall back to the separable matmul.
    """
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = img.shape
    if (H, W) == (out_h, out_w):
        return img
    if out_h and out_w and H % out_h == 0 and W % out_w == 0:
        fh, fw = H // out_h, W // out_w
        return img.reshape(B, out_h, fh, out_w, fw, C).mean(axis=(2, 4))
    return _resize(img, size, _area_weights)


def resize_nearest(img: jnp.ndarray, size) -> jnp.ndarray:
    """TF1 ``tf.image.resize_nearest_neighbor(align_corners=False)`` parity.

    Exact integer upscales reduce to ``repeat`` (out[k] = in[k // f]); otherwise the
    separable selection matmul.
    """
    out_h, out_w = int(size[0]), int(size[1])
    B, H, W, C = img.shape
    if (H, W) == (out_h, out_w):
        return img
    if out_h % H == 0 and out_w % W == 0:
        return jnp.repeat(jnp.repeat(img, out_h // H, axis=1), out_w // W, axis=2)
    return _resize(img, size, _nearest_weights)


def resize_like(inputs: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Nearest-resize ``inputs`` to ``ref``'s spatial dims if they differ
    (ref ``nets_optflow_depth.py:11-16`` — patches odd-dimension deconv mismatches)."""
    if inputs.shape[1:3] == ref.shape[1:3]:
        return inputs
    return resize_nearest(inputs, ref.shape[1:3])
