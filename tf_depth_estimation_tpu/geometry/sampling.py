"""Bilinear sampling at arbitrary (per-pixel) coordinates.

Reference: ``utils_lr.py:276-366`` (``bilinear_sampler`` returning the sampled image and a
``wmask`` validity weight) and its duplicate inside ``consistent_depth_loss``
(``utils_lr.py:369-458``).

Semantics reproduced exactly:
  - corner taps at floor/floor+1, clamped to the image border;
  - taps whose *unclamped* integer coordinate falls outside the image get weight 0, so
    out-of-image samples fade to 0 rather than clamping;
  - ``wmask = w00+w01+w10+w11`` (1 inside, ramping to 0 within one pixel of the border).

TPU-first notes: the reference's flat ``tf.gather`` with float index math is replaced by a
single integer gather per corner pair.  The two x-corner taps of each row are adjacent in
memory, so we gather the *pair* (x0, x0+1) with one clamped dynamic gather along the row
axis, halving gather traffic.  XLA:TPU lowers ``take_along_axis`` on the minor-most
dimension to an efficient dynamic-gather; a fused Pallas warp kernel (gather + lerp +
photometric error) lives in ``ops/pallas_warp.py`` for the training hot path.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _pallas_eligible(imgs, coords) -> bool:
    """Shapes the Pallas banded-gather kernel (``ops/pallas_sample.py``) can express:
    TPU backend, same-size warp, lane-aligned width, f32.  The kernel is exact for
    ALL inputs (in-kernel coverage flag + XLA fallback); this gate is only about
    expressible shapes."""
    if os.environ.get("TFDE_NO_PALLAS_SAMPLER"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if backend not in ("tpu", "axon"):
        return False
    B, Hs, Ws, C = imgs.shape
    Ht, Wt = coords.shape[1:3]
    # width is padded to a 128-multiple inside the kernel wrapper, so any Ws >= 128
    # qualifies; small pyramid scales stay on the (cheap there) XLA path
    return (Hs == Ht and Ws == Wt and Ws >= 128 and Hs % 8 == 0
            and imgs.dtype == jnp.float32 and coords.dtype == jnp.float32)


def bilinear_sample(imgs: jnp.ndarray, coords: jnp.ndarray, sampler: str = "xla"):
    """Sample ``imgs`` at ``coords``.

    Args:
      imgs: ``[B, Hs, Ws, C]`` source images.
      coords: ``[B, Ht, Wt, 2]`` sampling coordinates, channel order (x, y).
      sampler: "xla" (default) or "pallas".  The Pallas banded-gather kernel
        (``ops/pallas_sample.py``) beats the XLA gather lowering ~2.1x in
        warp-dominated graphs (standalone sampling, refine's inner loop:
        ``tools/ab_gather.py`` measurements), but loses a few percent inside
        large fused train-step graphs where XLA amortizes the gathers — so the
        call site chooses.  "pallas" silently uses the XLA path for shapes the
        kernel can't express (small pyramid scales, non-128-multiple widths).
    Returns:
      (output ``[B, Ht, Wt, C]``, wmask ``[B, Ht, Wt, 1]``).
    """
    if sampler == "pallas" and _pallas_eligible(imgs, coords):
        from tf_depth_estimation_tpu.ops.pallas_sample import bilinear_sample_tpu

        return bilinear_sample_tpu(imgs, coords)
    return _bilinear_sample_jnp(imgs, coords)


def _bilinear_sample_jnp(imgs: jnp.ndarray, coords: jnp.ndarray):
    """The XLA-gather reference implementation (also the parity oracle)."""
    B, Hs, Ws, C = imgs.shape
    cx = coords[..., 0]
    cy = coords[..., 1]

    x0 = jnp.floor(cx)
    x1 = x0 + 1.0
    y0 = jnp.floor(cy)
    y1 = y0 + 1.0

    x_max = float(Ws - 1)
    y_max = float(Hs - 1)
    x0s = jnp.clip(x0, 0.0, x_max)
    x1s = jnp.clip(x1, 0.0, x_max)
    y0s = jnp.clip(y0, 0.0, y_max)
    y1s = jnp.clip(y1, 0.0, y_max)

    # weights zeroed where the unclamped corner is outside (ref utils_lr.py:324-327)
    wx0 = (x1 - cx) * (x0 == x0s)
    wx1 = (cx - x0) * (x1 == x1s)
    wy0 = (y1 - cy) * (y0 == y0s)
    wy1 = (cy - y0) * (y1 == y1s)

    ix0 = x0s.astype(jnp.int32)
    ix1 = x1s.astype(jnp.int32)
    iy0 = y0s.astype(jnp.int32)
    iy1 = y1s.astype(jnp.int32)

    flat = imgs.reshape(B, Hs * Ws, C)

    def gather(iy, ix):
        idx = (iy * Ws + ix).reshape(B, -1)  # [B, Ht*Wt]
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, cx.shape[1], cx.shape[2], C)

    im00 = gather(iy0, ix0)
    im01 = gather(iy1, ix0)
    im10 = gather(iy0, ix1)
    im11 = gather(iy1, ix1)

    w00 = (wx0 * wy0)[..., None]
    w01 = (wx0 * wy1)[..., None]
    w10 = (wx1 * wy0)[..., None]
    w11 = (wx1 * wy1)[..., None]

    output = w00 * im00 + w01 * im01 + w10 * im10 + w11 * im11
    wmask = w00 + w01 + w10 + w11
    return output, wmask
