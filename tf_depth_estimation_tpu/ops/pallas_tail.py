"""Fused DispNet decoder tail as a single Pallas TPU kernel.

STATUS — compiles, exact, and MEASURED SLOWER than the XLA lowering; kept as the
documented negative result for "fuse the conv tail in Pallas" (see ROADMAP).  On this
toolchain (Mosaic 2026-08 via the axon remote-compile service), v5e, 576x384 b128:

  tail="overlap" (XLA, production default)   39.5 ms/batch whole-net  (3,240 fps)
  tail="pallas"  (this kernel)              237.8 ms/batch whole-net  (  538 fps)

Why it loses: Mosaic's layout discipline makes every column/phase shift a *materialized*
VPU copy — a static ``pltpu.roll`` lowers to a register-offset tweak whose operands then
can't feed ``tpu.concatenate`` (offset mismatch on non-concat dims), so shifts must be
dynamic rotates (runtime-zero laundering below), each moving the full tile through the
VPU.  The im2col assembly for the two GEMMs plus the disp1 tap reduction moves ~45 MB of
VMEM traffic per grid step (~138 GB/batch) — an order of magnitude more than the ~4 GB of
HBM round-trips the fusion saves.  XLA's conv lowering feeds overlapping windows to the
MXU through the memory path without VPU shifts; Pallas on TPU cannot express that, so
implicit-GEMM conv fusion is structurally VPU-bound here.  The kernel remains a worked
example of: 3-view halo BlockSpecs, runtime-zero dynamic rotates, phase GEMM weight
pre-transforms, and scoped-VMEM budgeting.

Original motivation (ref ``nets_optflow_depth.py:139-147``: upcnv1 -> concat[d2 bilinear
x2] -> icnv1 -> disp1): XLA materializes every full-resolution intermediate.  The kernel
keeps the tail in VMEM per row-tile:

  HBM reads:  x2 / d2 / d2-shifted row-halo blocks        (~0.5 GB/batch)
  VMEM:       up1 as a 2x2 phase GEMM (K=128, N=64), the d2 upsample phases,
              icnv1 as an overlapped 4x4/s2 im2col GEMM (K=272, N=64),
              disp1 as phase-masked 64-lane VPU reductions
  HBM write:  d1 in phase-packed layout [B,H,W,4] (depth-to-space happens in XLA)

All math is exact vs the reference graph (same multiply-adds, regrouped); parity is
locked by ``tests/test_pallas_tail.py`` in interpret mode and on-device A/B by
``tools/ab_fast.py 128 pallas``.  Weight/affine pre-transforms happen in XLA at trace
time (``prepare_tail_params``) — they are tiny.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_depth_estimation_tpu.ops.phase import _m_deconv3, _phase_kernel

# full-res taps (a, b) of icnv1/disp1 live at phase offsets:
#   full row 2u+p+a-1 = 2*(u + cy(p,a)) + r(p,a),  cy = (p+a-1)//2, r = (p+a-1)%2
_CY = {(p, a): ((p + a - 1) // 2, (p + a - 1) % 2) for p in range(2) for a in range(3)}


def prepare_tail_params(w_up1_tf, bn_up1, w_icnv1, bn_icnv1, w_disp1, b_disp1, dtype):
    """Pre-transform weights/affines for the kernel (runs in XLA, trace-time).

    w_up1_tf: (3,3,16,32) TF transpose layout; bn_*: (scale, shift) eval affines;
    w_icnv1: (3,3,17,16); w_disp1: (3,3,16,1).
    Returns a dict of kernel operands.
    """
    M, _, _ = _m_deconv3()
    w_up1 = jnp.transpose(w_up1_tf, (0, 1, 3, 2))      # (3,3,ci=32,co=16)
    K_up = _phase_kernel(w_up1, M, M)                  # (2,2,32,64)
    K_up = K_up.reshape(4 * 32, 4 * 16)                # (cy,cx,ci) x (p,q,o)

    # icnv1 as overlapped 4x4/s2: patch K-order (dy, dx, c) over the 17-ch full-res cat;
    # K4[(dy,dx), c, (p,q,o)] = w[dy-p, dx-q, c, o] (zero outside 0..2)
    w = w_icnv1
    taps = []
    for dy in range(4):
        for dx in range(4):
            pq = []
            for p in range(2):
                for q in range(2):
                    a, b = dy - p, dx - q
                    if 0 <= a < 3 and 0 <= b < 3:
                        pq.append(w[a, b])             # (17, 16)
                    else:
                        pq.append(jnp.zeros_like(w[0, 0]))
            taps.append(jnp.stack(pq, -1))             # (17, 16, 4) last = p*2+q
    K_ic = jnp.stack(taps, 0).transpose(0, 1, 3, 2)    # (16, 17, 4, 16) = (dydx,c,pq,o)
    K_ic = K_ic.reshape(16 * 17, 4 * 16)               # rows (dydx, c), cols (pq, o)

    # disp1 on the phase-packed (64-ch) y without lane splitting: for output phase
    # (p,q) and cell shift (cy,cx), a 64-lane mask-weight vector carrying w[a,b]
    # in the lane group of the contributing y-phase k=r*2+s (zero elsewhere);
    # tot[p,q] = sum_{cy,cx} lanes(y_shift[cy,cx] * w64[pq,cy+1,cx+1]).
    w64 = jnp.zeros((4, 3, 3, 64), jnp.float32)
    wd = w_disp1[..., 0].astype(jnp.float32)           # (3,3,16)
    for p in range(2):
        for q in range(2):
            for a in range(3):
                cy, r = _CY[(p, a)]
                for bb in range(3):
                    cx, s = _CY[(q, bb)]
                    k = r * 2 + s
                    w64 = w64.at[p * 2 + q, cy + 1, cx + 1,
                                 16 * k:16 * k + 16].add(wd[a, bb])

    su, tu = bn_up1
    si, ti = bn_icnv1
    return dict(
        K_up=K_up.astype(dtype),
        K_ic=K_ic.astype(dtype),
        aff_up=jnp.stack([jnp.tile(su, 4), jnp.tile(tu, 4)]).astype(jnp.float32),
        aff_ic=jnp.stack([jnp.tile(si, 4), jnp.tile(ti, 4)]).astype(jnp.float32),
        w_d1=w64.reshape(36, 64),                      # f32 (pq,cy,cx) x 64
        b_d1=jnp.asarray(b_disp1, jnp.float32).reshape(1, 1),
    )


def _tail_kernel(xA, xB, xC, dA, dB, dC, cA, cB, cC,
                 K_up, K_ic, aff_up, aff_ic, w_d1, b_d1, rt_zero, out_ref,
                 *, TR, H, W, dt, disp_scaling, min_disp):
    """One grid step: output cells rows [r0, r0+TR) of frame b, full width.

    x*/d*/c*: (1, TR, Wp, C) blocks of the same array at row-blocks rt-1/rt/rt+1
    (clamped at the edges — out-of-image rows are masked or re-clamped below).
    out_ref: (1, TR, W, 4) f32 block (phase-packed d1).
    """
    rt = pl.program_id(1)
    r0 = rt * TR
    Wp = xA.shape[2]

    # Mosaic layout discipline: a *static* roll is lowered as a register-offset
    # tweak, and tpu.concatenate rejects operands whose offsets differ on a
    # non-concat dim.  A roll by a traced amount lowers to tpu.dynamic_rotate,
    # which materializes the shift and yields offset-0 vectors — so we launder
    # every shift amount through a runtime zero (SMEM scalar; program_id*0 would
    # constant-fold back to a static roll).  dynamic_rotate also wants the
    # rotated dim aligned (8 sublanes / 128 lanes), hence the width padding and
    # the lane pad in ``lanesplit``; validity masks zero the wrap/pad columns.
    tz = rt_zero[0]

    def colshift(x, n):  # result[j] == x[j + n]; wrap cols land outside the image
        return pltpu.roll(x, tz + (x.shape[1] - n), axis=1) if n else x

    def lanesplit(x, n_parts, width):  # split lanes into offset-0 parts
        if x.shape[2] % 128:           # lane rotates want a multiple of 128 lanes
            pad = jnp.zeros(x.shape[:2] + (128 - x.shape[2] % 128,), x.dtype)
            x = jnp.concatenate([x, pad], axis=-1)
        return [pltpu.roll(x, tz + (x.shape[2] - i * width), axis=2)[:, :, 0:width]
                if i else x[:, :, 0:width] for i in range(n_parts)]

    # Assemble the 3-block row halo; row i of the concat == image row r0-TR+i
    # (only approximately at the clamped edges, where masks take over).
    x2v = jnp.concatenate([xA[0], xB[0], xC[0]], axis=0).astype(jnp.float32)
    d2v3 = jnp.concatenate([dA[0], dB[0], dC[0]], axis=0)
    d2c3 = jnp.concatenate([cA[0], cB[0], cC[0]], axis=0)
    # Valid boundary cells consume out-of-image x2 rows as conv SAME *zeros*; the
    # clamped halo blocks hold duplicate data there, so zero them explicitly.
    # (d2 needs no such fix: its bilinear taps only ever look down/right, and the
    # bottom clamp is handled at ``down`` below.)
    xabs = jax.lax.broadcasted_iota(jnp.int32, (3 * TR, 1, 1), 0) + (r0 - TR)
    x2v = jnp.where((xabs >= 0) & (xabs < H), x2v, 0.0)

    # --- up1: 2x2 phase GEMM over cells [r0-2, r0+TR+2) x [-2, Wp-2) ---
    # xwin row i == x2 cell r0-3+i ; col j == cell j-3 (host-side col pad +3).
    Mr = TR + 4
    xwin = x2v[TR - 3:2 * TR + 2]                      # (TR+5, Wp, 32) f32
    xsh = colshift(xwin, 1)
    patch = jnp.concatenate([      # bf16 pieces: halve the concat's VMEM footprint
        xwin[0:Mr, :, :].astype(dt),       # (cy=-1, cx=-1)
        xsh[0:Mr, :, :].astype(dt),        # (cy=-1, cx=0)
        xwin[1:Mr + 1, :, :].astype(dt),   # (cy=0,  cx=-1)
        xsh[1:Mr + 1, :, :].astype(dt),
    ], axis=-1)
    up = jax.lax.dot_general(
        patch.reshape(Mr * Wp, 128), K_up[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    up = up.reshape(Mr, Wp, 64)
    up = jnp.maximum(up * aff_up[0] + aff_up[1], 0.0)

    # --- masks: zero rows/cols outside the image (conv SAME zero padding).
    # up/cat col j == image cell j-2 (one left halo col beyond the x2 offset).
    rows = jax.lax.broadcasted_iota(jnp.int32, (Mr, Wp, 1), 0) + (r0 - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Mr, Wp, 1), 1) - 2
    valid = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
    up = jnp.where(valid, up, 0.0)                     # stays f32 (rotate support)
    up_ph = lanesplit(up, 4, 16)                       # four (Mr, Wp, 16) buffers

    # --- d2u phases over the same cell window (f32, TF1 bilinear x2) ---
    # dwin row i == d2 cell r0-2+i, col j == cell j-2 (host cols edge-padded);
    # cwin is the same tile pre-shifted one column right (cell j-1) in XLA.
    dwin = d2v3[TR - 2:2 * TR + 3]                     # (TR+5, Wp, 1) f32
    cwin = d2c3[TR - 2:2 * TR + 3]
    ee = dwin[0:Mr]
    ec = cwin[0:Mr]
    # TF1 bilinear x2 clamps its odd-row taps at the image bottom; the host pad
    # can't express that through the clamped halo blocks, so clamp here.
    down = rows + 1 < H
    oe_ = jnp.where(down, dwin[1:Mr + 1], ee)
    oc = jnp.where(down, cwin[1:Mr + 1], ec)
    d2u_ph = [ee, 0.5 * (ee + ec), 0.5 * (ee + oe_), 0.25 * (ee + ec + oe_ + oc)]
    # match the XLA graph's bf16 concat inputs, then widen back for f32 rotates
    d2u_ph = [jnp.where(valid, t, 0.0).astype(dt).astype(jnp.float32)
              for t in d2u_ph]

    # per-phase 17-channel cat buffers (all offset-0 concats); bf16 round-trip
    # matches the module graph's bf16 concat inputs exactly
    cats = [jnp.concatenate([u.astype(dt).astype(jnp.float32), v], axis=-1)
            for u, v in zip(up_ph, d2u_ph)]

    # --- icnv1: overlapped 4x4/s2 im2col GEMM over y cells [r0-1, r0+TR+1) ---
    My = TR + 2
    cat_sh = [[colshift(c, n) for n in range(3)] for c in cats]  # [ph][colshift]
    slices = []
    for dy in range(4):
        cy, r = (dy - 1) // 2, (dy - 1) % 2
        for dx in range(4):
            cx, s = (dx - 1) // 2, (dx - 1) % 2
            # cat row for y-cell u=r0-1+iy is index (u + cy) - (r0-2) = iy + 1 + cy
            # cat col for y-cell v=jx-1   is index (v + cx) + 2      = jx + 1 + cx
            sl = cat_sh[r * 2 + s][1 + cx][1 + cy:1 + cy + My, :, :]
            slices.append(sl.astype(dt))   # bf16 pieces (idempotent re-round)
    patches = jnp.concatenate(slices, axis=-1)         # (My, Wp, 272)
    y = jax.lax.dot_general(
        patches.reshape(My * Wp, 272), K_ic[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = y.reshape(My, Wp, 64)
    y = jnp.maximum(y * aff_ic[0] + aff_ic[1], 0.0)
    yrows = jax.lax.broadcasted_iota(jnp.int32, (My, Wp, 1), 0) + (r0 - 1)
    ycols = jax.lax.broadcasted_iota(jnp.int32, (My, Wp, 1), 1) - 1
    yvalid = (yrows >= 0) & (yrows < H) & (ycols >= 0) & (ycols < W)
    # reference casts icnv1's output to bf16 before disp1; keep f32 carrier for rolls
    y = jnp.where(yvalid, y.astype(dt).astype(jnp.float32), 0.0)  # (My, Wp, 64)

    # --- disp1 (3x3, 16 -> 1) on the VPU: phase-masked 64-lane reductions on the
    # unsplit y (no lane splitting; see ``prepare_tail_params`` w64 construction) ---
    y_sh = [colshift(y, n) for n in range(3)]          # [1+cx] (My, Wp, 64)
    acc = []
    for pq in range(4):
        tot = jnp.zeros((TR, W, 1), jnp.float32)
        for cy in (-1, 0, 1):
            for cx in (-1, 0, 1):
                sl = y_sh[1 + cx][1 + cy:1 + cy + TR, 0:W, :]
                wv = w_d1[pq * 9 + (cy + 1) * 3 + (cx + 1)]
                tot = tot + jnp.sum(sl * wv, axis=-1, keepdims=True)
        acc.append(tot)
    d1 = jnp.concatenate(acc, axis=-1) + b_d1[0, 0]
    d1 = disp_scaling * jax.nn.sigmoid(d1) + min_disp
    out_ref[0] = d1.astype(jnp.float32)


def fused_tail(x2, d2, params, *, disp_scaling=4.0, min_disp=0.0, tile_rows=8,
               interpret=False):
    """Run the fused tail. x2: [B,H,W,32] (bf16/f32), d2: [B,H,W,1] f32.

    Returns phase-packed d1 [B,H,W,4] f32 (apply ``ops.phase.depth_to_space`` for
    the full-resolution map).  ``params`` from ``prepare_tail_params``.
    """
    B, H, W, _ = x2.shape
    TR = tile_rows
    assert H % TR == 0, (H, TR)
    NT = H // TR
    dt = x2.dtype
    Wp = -(-(W + 5) // 8) * 8                          # sublane-aligned tile width
    x2p = jnp.pad(x2, ((0, 0), (0, 0), (3, Wp - W - 3), (0, 0)))
    d2pw = jnp.pad(d2, ((0, 0), (0, 0), (2, Wp - W - 1), (0, 0)), mode="edge")
    d2p = d2pw[:, :, 0:Wp, :]
    d2cp = d2pw[:, :, 1:Wp + 1, :]                     # pre-shifted one col right

    kernel = partial(
        _tail_kernel, TR=TR, H=H, W=W, dt=dt,
        disp_scaling=disp_scaling, min_disp=min_disp)

    grid = (B, NT)
    # 3-view halo: the same array blocked at rows rt-1 / rt / rt+1 (clamped).
    lo = lambda b, r: (b, jnp.maximum(r - 1, 0), 0, 0)
    mid = lambda b, r: (b, r, 0, 0)
    hi = lambda b, r: (b, jnp.minimum(r + 1, NT - 1), 0, 0)
    halo = lambda c, dty=None: [
        pl.BlockSpec((1, TR, Wp, c), ix, memory_space=pltpu.VMEM)
        for ix in (lo, mid, hi)]
    vspec = lambda shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(halo(32) + halo(1) + halo(1) + [
            vspec(params["K_up"].shape),
            vspec(params["K_ic"].shape),
            vspec(params["aff_up"].shape),
            vspec(params["aff_ic"].shape),
            vspec(params["w_d1"].shape),
            pl.BlockSpec((1, 1), lambda b, r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, r: (0,), memory_space=pltpu.SMEM),
        ]),
        out_specs=pl.BlockSpec((1, TR, W, 4), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 4), jnp.float32),
        # the kernel's materialized shift copies exceed the default 16 MB scoped
        # window; the v5e has 128 MB of VMEM — raise the ceiling instead of
        # shrinking the tile below MXU-efficient sizes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x2p, x2p, x2p, d2p, d2p, d2p, d2cp, d2cp, d2cp,
      params["K_up"], params["K_ic"], params["aff_up"], params["aff_ic"],
      params["w_d1"], params["b_d1"], jnp.zeros((1,), jnp.int32))
    return out
