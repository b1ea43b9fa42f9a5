"""Pallas TPU bilinear-sampler: banded two-step gather for the warp hot path.

STATUS — exact (0.0 forward error vs the jnp sampler), compiled and A/B'd on the
v5e at 192x256 b16 C3: **wins standalone** (fwd 14.8 vs 31.6 ms, grad 17.0 vs
34.9 ms); inside large fused graphs the verdict is *width-dependent*: XLA
amortizes in-graph gathers well at 128-multiple widths (depth_then_cam 69.4 vs
66.1 ms — slight loss) but NOT at other widths, where this kernel wins big —
config 4's 224x480 optflow_combine train step drops **188.9 -> 144.1 ms (-24%)**
with identical loss, and ships with ``sampler="pallas"`` as that config's default
(``LossWeights.optflow_combine``).  Elsewhere opt-in:
``bilinear_sample(..., sampler="pallas")``.  See ROADMAP "Pallas-on-TPU
conclusions".

The projective warp's 4-corner gather (``geometry/sampling.py``, ref
``utils_lr.py:276-366``) is the dominant cost of *standalone* warp evaluation on
TPU: XLA's gather lowering runs at scalar-ish speed there (one 16x192x256x3 sample
= 32.7 ms — ``tools/micro_warp.py``; formulation A/B in ``tools/ab_gather.py``).  Mosaic
*does* lower ``jnp.take_along_axis`` to a fast vector gather, but only in exactly-2D,
exactly-128-lane form (probed; 256-lane and 3D both fail to build).  This kernel
decomposes the arbitrary 2D gather into that primitive:

  grid step = (batch b, tile of TR output rows)
  1. band DMA:   rows [row0, row0+BK) of the source plane into VMEM, where
                 row0 = 8-aligned floor(min iy0 of the tile) — data-dependent,
                 computed in-kernel from the index block (coords are continuous, so a
                 tile's source rows cluster in a narrow band for real warps)
  2. x-gather:   per (output column half, source column half, x-tap): one 2D
                 (TR*BK, 128) lane-gather of the band at the tile's x indices,
                 halves combined by a select on ix >= 128
  3. y-select:   the 4 corner values fall out of a BK-term mask-accumulate over the
                 band rows (sublane gathers don't build on this toolchain)
  4. combine:    out = w00*im00 + w01*im01 + w10*im10 + w11*im11 — the reference's
                 exact product/sum order, with the weights computed by the SAME XLA
                 prologue as the jnp sampler (zero-weight-outside semantics included)

  coverage:      a tile whose y-span exceeds the band sets a flag; if ANY tile
                 overflows, the whole call falls back to the exact XLA sampler via
                 ``lax.cond`` (per-element fallback under vmap would execute both
                 branches — a whole-call cond keeps the fast path truly fast).  The
                 kernel is exact for ALL inputs; one extreme warp in a batch reverts
                 that call to XLA-gather speed, nothing more

Layout: channels-first (B, C, H, W) so the lane dim is W (a multiple of 128 — no lane
padding, which would make ANY-space DMA slices illegal on this toolchain).

Backward: ``bilinear_sample_tpu`` is a custom-VJP drop-in for
``geometry.sampling.bilinear_sample``.  The forward also returns the 4 corner planes as
residuals, so the coords cotangent is pure elementwise math (no gathers); the imgs
cotangent is an XLA scatter-add (dead-code-eliminated whenever the image is not
differentiated — the common photometric case).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 16   # output rows per tile
_BK = 32   # source-band rows resident per tile (8-aligned base)
# Tiling A/B on the v5e (16x192x256x3, near-identity coords): 16/32 = 9.9 ms,
# 8/24 = 10.0 ms, while 16/24 and 8/16 under-cover typical warps and collapse to
# the 32 ms fallback — the band must exceed tile span + jitter + 7 rows of
# base-alignment slack.


def _prologue(imgs, coords):
    """Corner indices + weights, exactly as the jnp sampler computes them
    (``geometry/sampling.py:35-60``)."""
    B, Hs, Ws, C = imgs.shape
    cx = coords[..., 0]
    cy = coords[..., 1]
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
    ints = dict(
        ix0=x0s.astype(jnp.int32), ix1=x1s.astype(jnp.int32),
        iy0=y0s.astype(jnp.int32), iy1=y1s.astype(jnp.int32),
    )
    w = dict(w00=wx0 * wy0, w01=wx0 * wy1, w10=wx1 * wy0, w11=wx1 * wy1)
    aux = dict(inx0=(x0 == x0s), inx1=(x1 == x1s), iny0=(y0 == y0s),
               iny1=(y1 == y1s), wx0=wx0, wx1=wx1, wy0=wy0, wy1=wy1)
    return ints, w, aux


def _sample_kernel(img_hbm, ix0, ix1, iy0, iy1, w00, w01, w10, w11,
                   out_ref, c00, c01, c10, c11, ok_ref, band, sem,
                   *, C, H, W, TR, BK):
    """One grid step: output rows [rt*TR, rt*TR+TR) of frame b, all channels."""
    b = pl.program_id(0)

    iy0t = iy0[0]                                       # (TR, W) int32
    iy1t = iy1[0]
    row0 = jnp.clip((jnp.min(iy0t) // 8) * 8, 0, H - BK)
    row0 = pl.multiple_of(row0, 8)
    ok = jnp.max(iy1t) - row0 <= BK - 1
    ok_ref[0, 0] = jnp.broadcast_to(ok.astype(jnp.int32), (8, 128))

    cp = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(row0, BK), :], band, sem)
    cp.start()
    cp.wait()

    nh = W // 128
    # duplicated-source trick: gathers are strictly (S, 128); tile the band so each
    # output row gathers from its own sublane group, and clamp per source-half so
    # the in-half gather is always in range (the select below picks the right half)
    y0rel = iy0t - row0                                  # in [0, BK)
    y1rel = iy1t - row0
    iota_bk = jax.lax.broadcasted_iota(jnp.int32, (TR, BK, 128), 1)

    for c in range(C):
        plane = band[c]                                  # (BK, W) f32
        halves = [plane[:, h * 128:(h + 1) * 128] for h in range(nh)]
        dups = [jnp.concatenate([h] * TR, axis=0) for h in halves]  # (TR*BK, 128)

        corners = []
        for ix in (ix0, ix1):                            # x-taps
            ixt = ix[0]                                  # (TR, W) int32
            taps = []
            for oh in range(nh):                         # output column half
                ixh = ixt[:, oh * 128:(oh + 1) * 128]    # (TR, 128)
                idx3 = jnp.broadcast_to(jnp.expand_dims(ixh, 1), (TR, BK, 128))
                idx = idx3.reshape(TR * BK, 128)
                got = None
                for sh in range(nh):                     # source column half
                    gi = jnp.clip(idx - sh * 128, 0, 127)
                    g = jnp.take_along_axis(dups[sh], gi, axis=1)
                    got = g if got is None else jnp.where(idx >= sh * 128, g, got)
                taps.append(got.reshape(TR, BK, 128))
            corners.append(taps)                         # [tap][outhalf] (TR,BK,128)

        # y-select: BK-term mask accumulate -> the 4 corner planes (TR, W)
        def ysel(yrel, taps):
            outs = []
            for oh in range(nh):
                yh = jax.lax.slice(yrel, (0, oh * 128), (TR, (oh + 1) * 128))
                m = jnp.broadcast_to(jnp.expand_dims(yh, 1),
                                     (TR, BK, 128)) == iota_bk
                outs.append(jnp.sum(jnp.where(m, taps[oh], 0.0), axis=1))
            return jnp.concatenate(outs, axis=1)         # (TR, W)

        im00 = ysel(y0rel, corners[0])
        im10 = ysel(y0rel, corners[1])
        im01 = ysel(y1rel, corners[0])
        im11 = ysel(y1rel, corners[1])

        # reference sum order (utils_lr.py:351-356 / sampling.py:78)
        out_ref[0, c] = (w00[0] * im00 + w01[0] * im01
                         + w10[0] * im10 + w11[0] * im11)
        c00[0, c] = im00
        c01[0, c] = im01
        c10[0, c] = im10
        c11[0, c] = im11


def _run_kernel(imgs_cf, ints, interpret=False):
    """imgs_cf: (B, C, H, W) f32.  Returns (out_cf, corners_cf x4, ok (B, NT))."""
    B, C, H, W = imgs_cf.shape
    # largest tile that divides H (the eligibility gate guarantees H % 8 == 0)
    TR = _TR if H % _TR == 0 else 8
    BK = min(_BK, H)   # small images: the whole height is the band
    assert H % TR == 0 and W % 128 == 0, (H, W)
    NT = H // TR
    grid = (B, NT)
    plane = lambda: pl.BlockSpec((1, TR, W), lambda b, r: (b, r, 0),
                                 memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, C, TR, W), lambda b, r: (b, 0, r, 0),
                           memory_space=pltpu.VMEM)
    kernel = partial(_sample_kernel, C=C, H=H, W=W, TR=TR, BK=BK)
    out_shape = jax.ShapeDtypeStruct((B, C, H, W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [plane()] * 8,
        out_specs=[outspec] * 5 + [
            pl.BlockSpec((1, 1, 8, 128), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[out_shape] * 5 + [
            jax.ShapeDtypeStruct((B, NT, 8, 128), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((C, BK, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(imgs_cf, ints["ix0"], ints["ix1"], ints["iy0"], ints["iy1"],
      ints["w00"], ints["w01"], ints["w10"], ints["w11"])
    return outs


def _sample_banded(imgs, coords, interpret=False):
    """Full forward: prologue + kernel + exact-fallback cond.

    Returns (output, wmask, corners) with corners = (im00, im01, im10, im11),
    each (B, Ht, Wt, C)."""
    B, Hs, Ws, C = imgs.shape
    # Exact border semantics come from the prologue at the ORIGINAL width; the
    # kernel itself runs at the next 128-multiple width (zero-weight pad columns,
    # edge-padded row indices so the band base is unaffected), sliced back after.
    ints, w, _aux = _prologue(imgs, coords)
    Wp = -(-Ws // 128) * 128
    planes = dict(ints)
    planes.update({k: v for k, v in w.items()})
    if Wp != Ws:
        cp = ((0, 0), (0, 0), (0, Wp - Ws))
        planes = {k: jnp.pad(v, cp, mode="edge" if k.startswith("i") else "constant")
                  for k, v in planes.items()}
        imgs_k = jnp.pad(imgs, ((0, 0), (0, 0), (0, Wp - Ws), (0, 0)))
    else:
        imgs_k = imgs
    imgs_cf = jnp.transpose(imgs_k, (0, 3, 1, 2))
    out_cf, c00, c01, c10, c11, okt = _run_kernel(imgs_cf, planes,
                                                  interpret=interpret)
    tocl = lambda t: jnp.transpose(t, (0, 2, 3, 1))[:, :, 0:Ws]

    def fast(_):
        return (tocl(out_cf), tocl(c00), tocl(c01), tocl(c10), tocl(c11))

    def slow(_):
        # exact XLA gathers (rare: a tile's y-span exceeded the band)
        flat = imgs.reshape(B, Hs * Ws, C)

        def gather(iy, ix):
            idx = (iy * Ws + ix).reshape(B, -1)
            out = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return out.reshape(B, coords.shape[1], coords.shape[2], C)

        im00 = gather(ints["iy0"], ints["ix0"])
        im01 = gather(ints["iy1"], ints["ix0"])
        im10 = gather(ints["iy0"], ints["ix1"])
        im11 = gather(ints["iy1"], ints["ix1"])
        out = (w["w00"][..., None] * im00 + w["w01"][..., None] * im01
               + w["w10"][..., None] * im10 + w["w11"][..., None] * im11)
        return (out, im00, im01, im10, im11)

    out, im00, im01, im10, im11 = jax.lax.cond(
        jnp.all(okt[..., 0, 0] == 1), fast, slow, operand=None)
    wmask = (w["w00"] + w["w01"] + w["w10"] + w["w11"])[..., None]
    return out, wmask, (im00, im01, im10, im11)


@jax.custom_vjp
def bilinear_sample_tpu(imgs, coords):
    """Drop-in for ``geometry.sampling.bilinear_sample`` with the Pallas fast path.

    Args/returns identical: imgs (B, Hs, Ws, C), coords (B, Ht, Wt, 2) ->
    (output (B, Ht, Wt, C), wmask (B, Ht, Wt, 1))."""
    out, wmask, _ = _sample_banded(imgs, coords)
    return out, wmask


def _fwd(imgs, coords):
    out, wmask, corners = _sample_banded(imgs, coords)
    return (out, wmask), (imgs, coords, corners)


def _bwd(res, cots):
    imgs, coords, (im00, im01, im10, im11) = res
    dout, dwmask = cots
    B, Hs, Ws, C = imgs.shape
    # one shared prologue — the zero-weight-outside border semantics live in ONE
    # place; the backward derives everything from its outputs
    ints, w, aux = _prologue(imgs, coords)
    wx0, wx1, wy0, wy1 = aux["wx0"], aux["wx1"], aux["wy0"], aux["wy1"]
    # d w / d cx, cy (a.e.; floor/clip boundaries contribute 0, matching XLA autodiff)
    dwx0 = -aux["inx0"].astype(imgs.dtype)
    dwx1 = aux["inx1"].astype(imgs.dtype)
    dwy0 = -aux["iny0"].astype(imgs.dtype)
    dwy1 = aux["iny1"].astype(imgs.dtype)

    s00 = jnp.sum(dout * im00, axis=-1)
    s01 = jnp.sum(dout * im01, axis=-1)
    s10 = jnp.sum(dout * im10, axis=-1)
    s11 = jnp.sum(dout * im11, axis=-1)
    dm = dwmask[..., 0]
    # output terms + wmask terms share the weight products
    dcx = (dwx0 * wy0 * (s00 + dm) + dwx0 * wy1 * (s01 + dm)
           + dwx1 * wy0 * (s10 + dm) + dwx1 * wy1 * (s11 + dm))
    dcy = (wx0 * dwy0 * (s00 + dm) + wx0 * dwy1 * (s01 + dm)
           + wx1 * dwy0 * (s10 + dm) + wx1 * dwy1 * (s11 + dm))
    dcoords = jnp.stack([dcx, dcy], axis=-1)

    # image cotangent: scatter-add of weighted output cotangents at the corner
    # indices (XLA scatter — DCE'd when the sampled tensor isn't differentiated)
    flat = jnp.zeros((B, Hs * Ws, C), imgs.dtype)

    def scat(flat, iy, ix, wgt):
        idx = (iy * Ws + ix).reshape(B, -1, 1)
        upd = (wgt[..., None] * dout).reshape(B, -1, C)
        return flat.at[jnp.arange(B)[:, None, None],
                       idx, jnp.arange(C)[None, None, :]].add(upd)

    flat = scat(flat, ints["iy0"], ints["ix0"], w["w00"])
    flat = scat(flat, ints["iy1"], ints["ix0"], w["w01"])
    flat = scat(flat, ints["iy0"], ints["ix1"], w["w10"])
    flat = scat(flat, ints["iy1"], ints["ix1"], w["w11"])
    dimgs = flat.reshape(B, Hs, Ws, C)
    return dimgs, dcoords


bilinear_sample_tpu.defvjp(_fwd, _bwd)
