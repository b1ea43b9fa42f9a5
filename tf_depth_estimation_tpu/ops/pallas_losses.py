"""Pallas TPU kernels for the per-scale loss hot ops.

Two fused kernels that run every training step at every pyramid scale:

- ``sig_l2_fused`` — the scale-invariant-gradient L2 loss
  (``lmbspecialops.scale_invariant_gradient`` + ``tfutils.pointwise_l2_loss``,
  SURVEY §2.5): for each delta, normalized forward differences of pred and gt in x and y,
  squared-difference accumulation, per-pixel sqrt, global sum — all in one VMEM-resident
  pass.  The jnp/XLA composition materializes the stacked [B, H, W, 2*len(deltas)] sig
  images for pred AND gt plus their difference; this kernel keeps a single [H, W]
  accumulator per image, cutting HBM traffic by ~6x for the 5-delta variant.

- ``smoothness_fused`` — the second-order smoothness term (``my_losses.py:27-36``): all
  four |second difference| means in one pass over the prediction.

Shifts are expressed as ``pltpu.roll`` along lanes (x) / sublanes (y) with iota masks —
fully supported by Mosaic (unlike cross-tile gathers, see ``pallas_warp.py``).

Both ops carry custom VJPs whose backward is the XLA autodiff of the reference jnp
implementation — bit-identical gradients to the baseline, fused forward.

STATUS (measured on the v5e, 16x192x256): the kernels are exact (parity ~1e-7 vs the jnp
path, zero gradient error), but XLA's own fusion currently WINS on these elementwise
reduction pipelines — smoothness: pallas 2.0 ms vs XLA 0.95 ms; the 5-delta sig kernel's
whole-image blocks exceed the chip's 128 MB VMEM (unrolled-delta temporaries kept live by
Mosaic).  The production loss pipelines therefore keep the jnp implementations; these
kernels remain as verified building blocks for a future tiled/DMA-pipelined revision
(row-tiling with halo DMA would cut the VMEM footprint ~H/64-fold).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_depth_estimation_tpu.losses.basic import second_order_smoothness as _jnp_smooth
from tf_depth_estimation_tpu.ops.sig import (
    pointwise_l2_loss as _jnp_l2,
    scale_invariant_gradient as _jnp_sig,
)


# --------------------------------------------------------------------------------
# sig + pointwise-L2
# --------------------------------------------------------------------------------
def _shifted(x, d: int, axis: int):
    """x shifted by -d along axis (bring x[i+d] to i), wrapped; mask separately.
    pltpu.roll requires a non-negative shift, so -d is expressed as n-d."""
    n = x.shape[axis]
    return pltpu.roll(x, (n - d) % n, axis=axis)


def _valid_mask(H: int, W: int, d: int, axis: int):
    n = H if axis == 0 else W
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), dimension=axis)
    return (idx + d) < n


def _sig_kernel(pred_ref, gt_ref, out_ref, *, H, W, deltas, eps_sig, eps_l2):
    pred = pred_ref[:]
    gt = gt_ref[:]
    acc = jnp.zeros((H, W), jnp.float32)
    for d in deltas:
        for axis in (1, 0):  # x then y (order irrelevant for the sum)
            if d >= (W if axis == 1 else H):
                continue
            valid = _valid_mask(H, W, d, axis).astype(jnp.float32)
            p_s = _shifted(pred, d, axis)
            g_s = _shifted(gt, d, axis)
            gp = (p_s - pred) / (jnp.abs(p_s) + jnp.abs(pred) + eps_sig) * valid
            gg = (g_s - gt) / (jnp.abs(g_s) + jnp.abs(gt) + eps_sig) * valid
            diff = gp - gg
            acc = acc + diff * diff
    out_ref[0, 0] = jnp.sum(jnp.sqrt(acc + eps_l2))


def _sig_fused_impl(pred, gt, deltas, eps_sig, eps_l2, interpret):
    B, H, W, C = pred.shape
    if C != 1:
        ps = _jnp_sig(pred, deltas, tuple(1.0 for _ in deltas), eps_sig)
        gs = _jnp_sig(gt, deltas, tuple(1.0 for _ in deltas), eps_sig)
        return _jnp_l2(ps, gs, eps_l2)
    kernel = functools.partial(_sig_kernel, H=H, W=W, deltas=tuple(deltas),
                               eps_sig=eps_sig, eps_l2=eps_l2)
    sums = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, W, None), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, W, None), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        # whole-image blocks need more than the 16MB default scoped-vmem budget at the
        # reference resolutions (Mosaic keeps the unrolled deltas' temporaries live)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pred, gt)
    return jnp.sum(sums) / (B * H * W)


def _sig_jnp_ref(pred, gt, deltas, eps_sig, eps_l2):
    weights = tuple(1.0 for _ in deltas)
    return _jnp_l2(_jnp_sig(pred, deltas, weights, eps_sig),
                   _jnp_sig(gt, deltas, weights, eps_sig), eps_l2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sig_l2_fused(pred, gt, deltas: Sequence[int] = (2,), eps_sig: float = 0.001,
                 eps_l2: float = 1e-6, interpret: bool = False):
    """Fused mean_pixels sqrt(sum_{deltas, x/y} (sig(pred)-sig(gt))^2 + eps)."""
    return _sig_fused_impl(pred, gt, tuple(deltas), eps_sig, eps_l2, interpret)


def _sig_fwd(pred, gt, deltas, eps_sig, eps_l2, interpret):
    return _sig_fused_impl(pred, gt, tuple(deltas), eps_sig, eps_l2, interpret), (pred, gt)


def _sig_bwd(deltas, eps_sig, eps_l2, interpret, res, ct):
    pred, gt = res
    _, vjp = jax.vjp(
        lambda p, g: _sig_jnp_ref(p, g, tuple(deltas), eps_sig, eps_l2), pred, gt
    )
    return vjp(ct)


sig_l2_fused.defvjp(_sig_fwd, _sig_bwd)


# --------------------------------------------------------------------------------
# second-order smoothness
# --------------------------------------------------------------------------------
def _smooth_kernel(pred_ref, out_ref, *, H, W):
    x = pred_ref[:]
    # first differences (valid lengths H-1 / W-1)
    dy = (_shifted(x, 1, 0) - x) * _valid_mask(H, W, 1, 0)
    dx = (_shifted(x, 1, 1) - x) * _valid_mask(H, W, 1, 1)
    # second differences; each term's mean uses its own valid count (jnp semantics)
    vx2 = _valid_mask(H, W, 2, 1).astype(jnp.float32)
    vy2 = _valid_mask(H, W, 2, 0).astype(jnp.float32)
    vxy = (_valid_mask(H, W, 1, 0) & _valid_mask(H, W, 1, 1)).astype(jnp.float32)
    dx2 = jnp.abs((_shifted(dx, 1, 1) - dx)) * vx2
    dy2 = jnp.abs((_shifted(dy, 1, 0) - dy)) * vy2
    dxdy = jnp.abs((_shifted(dx, 1, 0) - dx)) * vxy
    dydx = jnp.abs((_shifted(dy, 1, 1) - dy)) * vxy
    nx2 = float(H * (W - 2))
    ny2 = float((H - 2) * W)
    nxy = float((H - 1) * (W - 1))
    out_ref[0, 0] = (
        jnp.sum(dx2) / nx2 + jnp.sum(dy2) / ny2
        + jnp.sum(dxdy) / nxy + jnp.sum(dydx) / nxy
    )


def _smooth_fused_impl(pred, interpret):
    B, H, W, C = pred.shape
    if C != 1 or H < 3 or W < 3:
        return _jnp_smooth(pred)
    kernel = functools.partial(_smooth_kernel, H=H, W=W)
    sums = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((None, H, W, None), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pred)
    return jnp.sum(sums) / B


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def smoothness_fused(pred, interpret: bool = False):
    """Fused second-order smoothness, equal to ``losses.second_order_smoothness``."""
    return _smooth_fused_impl(pred, interpret)


def _smooth_fwd(pred, interpret):
    return _smooth_fused_impl(pred, interpret), pred


def _smooth_bwd(interpret, pred, ct):
    _, vjp = jax.vjp(_jnp_smooth, pred)
    return vjp(ct)


smoothness_fused.defvjp(_smooth_fwd, _smooth_bwd)
