"""Pallas TPU kernel: fused bilinear warp (gather + lerp + validity mask).

TPU-native replacement for the hot op of the reference's training losses — the
gather-heavy ``bilinear_sampler`` (``utils_lr.py:276-366``) called 2-4x per scale per
step via ``projective_inverse_warp``.  The jnp implementation
(``geometry/sampling.py``) lowers to four XLA gathers plus materialized corner images;
this kernel computes corner indices, the four gathers, the bilinear combine, and the
border-weight mask in one fused VMEM-resident pass.

Mosaic lowers ``jnp.take_along_axis`` along the lane (minor-most) axis natively but
requires the index array to have exactly the source's shape.  Layout trick: one kernel
block packs **8 batch elements as the 8 sublanes** — each sublane row holds one image's
flattened pixels and gathers with its own coordinate row, so source/index shapes match
exactly, every sublane does useful work, and all elementwise math runs at full VPU
width.  Constraints (else: jnp fallback): same-size warp (``Ht*Wt == Hs*Ws``), batch
divisible by 8, and the flat image row fits VMEM comfortably.

Gradients: custom VJP whose backward is the XLA autodiff of the reference jnp sampler
(identical math) — the fused forward is a drop-in inside ``jax.grad``.

STATUS: the kernel is exact (verified against the jnp sampler in interpret mode), but the
current Mosaic toolchain lowers ``take_along_axis`` to ``tpu.dynamic_gather``, which is an
intra-128-lane shuffle — cross-tile indices fail to compile (probed empirically: only
lane-size-128 gathers build).  Until Mosaic grows cross-tile gathers, the compiled-TPU
path is disabled (``_TPU_GATHER_OK``) and ``bilinear_sample_fused`` falls back to the jnp
sampler, whose XLA gather lowering uses the hardware gather unit directly.  The fused
loss kernels that DO compile live in ``ops/pallas_losses.py``.

SUPERSEDED BY ``ops/pallas_sample.py``: the banded two-step gather sampler there IS
compiled on this toolchain (band DMA + 128-lane gathers), is exact, and is the
production Pallas sampler (default for the optflow_combine and optflow_only configs —
see the per-config table in ROADMAP.md).  This module is kept as the research record
of the fully-fused approach and its Mosaic gather limitation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_depth_estimation_tpu.geometry.sampling import bilinear_sample as _jnp_sample

_S = 8               # batch elements per kernel block (sublane rows)
_MAX_HW = 131072     # flat-image lane limit for the VMEM-resident layout
_TPU_GATHER_OK = False  # Mosaic dynamic_gather is intra-tile only (see module docstring)


def _warp_kernel(img_ref, cx_ref, cy_ref, out_ref, mask_ref, *, Hs, Ws):
    """Block: one channel of 8 batch elements. img/cx/cy/out/mask refs: [8, Hs*Ws]."""
    cx = cx_ref[:]
    cy = cy_ref[:]

    x0 = jnp.floor(cx)
    x1 = x0 + 1.0
    y0 = jnp.floor(cy)
    y1 = y0 + 1.0

    x0s = jnp.clip(x0, 0.0, float(Ws - 1))
    x1s = jnp.clip(x1, 0.0, float(Ws - 1))
    y0s = jnp.clip(y0, 0.0, float(Hs - 1))
    y1s = jnp.clip(y1, 0.0, float(Hs - 1))

    wx0 = (x1 - cx) * (x0 == x0s)
    wx1 = (cx - x0) * (x1 == x1s)
    wy0 = (y1 - cy) * (y0 == y0s)
    wy1 = (cy - y0) * (y1 == y1s)

    ix0 = x0s.astype(jnp.int32)
    ix1 = x1s.astype(jnp.int32)
    iy0 = y0s.astype(jnp.int32) * Ws
    iy1 = y1s.astype(jnp.int32) * Ws

    w00 = wx0 * wy0
    w01 = wx0 * wy1
    w10 = wx1 * wy0
    w11 = wx1 * wy1

    img = img_ref[:]
    g00 = jnp.take_along_axis(img, iy0 + ix0, axis=1)
    g01 = jnp.take_along_axis(img, iy1 + ix0, axis=1)
    g10 = jnp.take_along_axis(img, iy0 + ix1, axis=1)
    g11 = jnp.take_along_axis(img, iy1 + ix1, axis=1)
    out_ref[:] = w00 * g00 + w01 * g01 + w10 * g10 + w11 * g11

    @pl.when(pl.program_id(1) == 0)
    def _():
        mask_ref[:] = w00 + w01 + w10 + w11


def _supported(imgs, coords) -> bool:
    B, Hs, Ws, C = imgs.shape
    _, Ht, Wt, _ = coords.shape
    return (Ht * Wt == Hs * Ws) and (B % _S == 0) and (Hs * Ws <= _MAX_HW)


def _sample_fused_fwd_impl(imgs: jnp.ndarray, coords: jnp.ndarray, interpret: bool):
    if not _supported(imgs, coords) or not (interpret or _TPU_GATHER_OK):
        return _jnp_sample(imgs, coords)

    B, Hs, Ws, C = imgs.shape
    _, Ht, Wt, _ = coords.shape
    HW = Hs * Ws
    G = B // _S

    # [G, C, 8, HW]: channel-major so one grid step streams one channel of 8 images
    img_flat = imgs.transpose(0, 3, 1, 2).reshape(G, _S, C, HW).transpose(0, 2, 1, 3)
    cx = coords[..., 0].reshape(G, _S, HW)
    cy = coords[..., 1].reshape(G, _S, HW)

    kernel = functools.partial(_warp_kernel, Hs=Hs, Ws=Ws)
    out, mask = pl.pallas_call(
        kernel,
        grid=(G, C),
        in_specs=[
            pl.BlockSpec((None, None, _S, HW), lambda g, c: (g, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _S, HW), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _S, HW), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, _S, HW), lambda g, c: (g, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _S, HW), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, C, _S, HW), imgs.dtype),
            jax.ShapeDtypeStruct((G, _S, HW), coords.dtype),
        ],
        interpret=interpret,
    )(img_flat, cx, cy)

    out = out.transpose(0, 2, 1, 3).reshape(B, C, Ht, Wt).transpose(0, 2, 3, 1)
    mask = mask.reshape(B, Ht, Wt, 1)
    return out, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sample_fused(imgs, coords, interpret: bool = False):
    """Drop-in fused version of ``geometry.bilinear_sample`` (same outputs/semantics)."""
    return _sample_fused_fwd_impl(imgs, coords, interpret)


def _fwd(imgs, coords, interpret):
    return _sample_fused_fwd_impl(imgs, coords, interpret), (imgs, coords)


def _bwd(interpret, res, cts):
    imgs, coords = res
    _, vjp = jax.vjp(_jnp_sample, imgs, coords)
    return vjp(cts)


bilinear_sample_fused.defvjp(_fwd, _bwd)
