"""Phase-space (space-to-depth) conv rewrites for MXU-shaped inference.

The DispNet graph (reference ``nets_optflow_depth.py:76-147``) spends most of its time in
layers whose native lowering is MXU-hostile on TPU:

  * the k3/s2 **deconvs** lower through input dilation (zero insertion), wasting taps;
  * the 7x7 **stem convs** (cnv1/cnv1b) run with 3..32 channels — the contraction and
    output-feature dims are far below the 128-lane MXU;
  * the **full-resolution tail** (upcnv1/icnv1/disp1) runs convs with N=16/1 output
    features over 384x576 pixels.

Every transform here is an *exact* algebraic reindexing (same multiply-adds, regrouped):
a stride-2 output is split into its 2x2 pixel phases, so a deconv becomes one dense 2x2
conv producing 4x the features followed by a free depth-to-space, and a stride-1 conv at
resolution 2H becomes one conv over the phase-packed half-resolution tensor.  Channel
counts multiply by 4, mapping onto the 128-wide MXU; FLOP overhead from zero-filled
envelope taps is documented per builder.  Exactness (up to float reassociation) is locked
by ``tests/test_phase.py`` against the reference lowerings.

Layout conventions
------------------
Phase-packed tensors hold channels in ``(p, q, c)`` order — row phase major, then column
phase, then the original channel: ``packed[..., (p*2+q)*C + c] == full[2u+p, 2v+q, c]``.
``space_to_depth`` / ``depth_to_space`` convert; BN/bias vectors broadcast with
``jnp.tile(v, 4)``.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B,2H,2W,C] -> [B,H,W,4C] with (p,q,c) channel order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,4C] with (p,q,c) channel order -> [B,2H,2W,C]."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)


def space_to_depth_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B,nH,nW,C] -> [B,H,W,n*n*C], same (p,q,c) channel order as space_to_depth.

    ``out[..., (p*n+q)*C + c] == x[n*u+p, n*v+q, c]`` — generic block size for the
    patchify stems / subpixel heads of the turbo architecture track (models/turbo.py).
    """
    B, H, W, C = x.shape
    assert H % n == 0 and W % n == 0, (x.shape, n)
    x = x.reshape(B, H // n, n, W // n, n, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // n, W // n, n * n * C)


def depth_to_space_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B,H,W,n*n*C] with (p,q,c) channel order -> [B,nH,nW,C]. Inverse of above."""
    B, H, W, Cn = x.shape
    C = Cn // (n * n)
    assert C * n * n == Cn, (x.shape, n)
    x = x.reshape(B, H, W, n, n, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n * H, n * W, C)


# ---------------------------------------------------------------------------
# Tap-routing matrices.
#
# A conv tap `a` (0..k-1) contributes to output row y from input row f(y, a).  Splitting
# rows into (cell, phase) pairs y = 2u+p / 2c+r turns each case into a sparse 0/1 routing
# tensor M[cell, r_in, p_out, a]; the phase-space kernel is then one einsum
#   K[cy,cx,(r,s,ci),(p,q,co)] = sum_ab Mh[cy,r,p,a] * Mw[cx,s,q,b] * w[a,b,ci,co].
# Ms are trace-time numpy constants; the einsum runs once per call on the (tiny) weights.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _m_s1(k: int):
    """Stride-1 SAME conv, phase input -> phase output.

    out[2u+p] = sum_a in[2u+p+a-h], h=(k-1)//2; input row 2(u+cy)+r  =>  a = 2*cy+r-p+h.
    Envelope cells cmin..cmax; zero-filled taps cost (4*E^2)/(k^2) extra FLOPs
    (k3: 4.0x, k5: 1.44x, k7: 2.04x).
    """
    h = (k - 1) // 2
    cmin = int(np.floor((0 - h) / 2))           # t = p+a-h, min at p=0, a=0
    cmax = int(np.floor((1 + k - 1 - h) / 2))   # max at p=1, a=k-1
    E = cmax - cmin + 1
    M = np.zeros((E, 2, 2, k), np.float32)
    for ci_, cy in enumerate(range(cmin, cmax + 1)):
        for r in range(2):
            for p in range(2):
                a = 2 * cy + r - p + h
                if 0 <= a < k:
                    M[ci_, r, p, a] = 1.0
    return M, -cmin, cmax


@lru_cache(maxsize=None)
def _m_s2_from_phase(k: int, pad_beg: int):
    """Stride-2 SAME conv consuming a phase-packed input, normal output.

    out[y] = sum_a in[2y+a-pad_beg]; input row 2(y+cy)+r  =>  a = 2*cy + r + pad_beg.
    """
    amin_c = int(np.floor((0 - 1 - pad_beg) / 2))
    amax_c = int(np.floor((k - 1 - pad_beg) / 2))
    E = amax_c - amin_c + 1
    M = np.zeros((E, 2, 1, k), np.float32)
    for ci_, cy in enumerate(range(amin_c, amax_c + 1)):
        for r in range(2):
            a = 2 * cy + r + pad_beg
            if 0 <= a < k:
                M[ci_, r, 0, a] = 1.0
    return M, -amin_c, amax_c


@lru_cache(maxsize=None)
def _m_stem(k: int, pad_beg: int):
    """Stride-2 SAME conv, 4-way space-to-depth input -> phase-packed (2x) output.

    out[2U+P] = sum_a in[2(2U+P)+a-pad_beg]; input row 4(U+cy)+r (r in 0..4) after the
    input was padded by pad_beg  =>  a = 4*cy + r - 2*P  (pad folded into the s2d shift).
    """
    amin_c, amax_c = 0, 0
    taps = []
    for P in range(2):
        for r in range(4):
            for cy in range(-2, 3):
                a = 4 * cy + r - 2 * P
                if 0 <= a < k:
                    taps.append((cy, r, P, a))
                    amin_c = min(amin_c, cy)
                    amax_c = max(amax_c, cy)
    E = amax_c - amin_c + 1
    M = np.zeros((E, 4, 2, k), np.float32)
    for cy, r, P, a in taps:
        M[cy - amin_c, r, P, a] = 1.0
    return M, -amin_c, amax_c


@lru_cache(maxsize=None)
def _m_deconv3():
    """TF conv2d_transpose k3/s2 SAME (even output), normal input -> phase output.

    out[n] = sum_{m,a: n=2m+a} in[m] w[a]  =>  n=2u+p, m=u+cy: a = p - 2*cy, cy in {-1,0}.
    16 envelope taps vs 9 real ones — 16/18 of the *nominal* deconv FLOPs (a net win).
    """
    M = np.zeros((2, 1, 2, 3), np.float32)  # cells cy=-1,0
    for ci_, cy in enumerate((-1, 0)):
        for p in range(2):
            a = p - 2 * cy
            if 0 <= a < 3:
                M[ci_, 0, p, a] = 1.0
    return M, 1, 0


def _phase_kernel(w_hwio: jnp.ndarray, Mh: np.ndarray, Mw: np.ndarray) -> jnp.ndarray:
    """K[cy,cx,(r,s,ci),(p,q,co)] = sum_ab Mh[cy,r,p,a] Mw[cx,s,q,b] w[a,b,ci,co]."""
    Mh = jnp.asarray(Mh, w_hwio.dtype)
    Mw = jnp.asarray(Mw, w_hwio.dtype)
    K = jnp.einsum("irpa,jsqb,abco->ijrscpqo", Mh, Mw, w_hwio)
    Eh, Ew, R, S, Ci, P, Q, Co = K.shape
    return K.reshape(Eh, Ew, R * S * Ci, P * Q * Co)


def _regroup_in_channels(K: jnp.ndarray, group_sizes: Sequence[int], rs: int) -> jnp.ndarray:
    """Permute kernel input channels from (r, s, c_global) to concat_g[(r, s, c_g)].

    Phase-packed activations are concatenations of per-tensor s2d blocks (each internally
    (r,s,c_g)-ordered); the einsum above produces (r,s,c_global).  ``rs`` is the number of
    input phases (4 normally).
    """
    Ci = sum(group_sizes)
    perm = []
    off = 0
    for g in group_sizes:
        for r in range(rs):
            for c in range(g):
                perm.append(r * Ci + off + c)
        off += g
    return jnp.take(K, np.asarray(perm, np.int32), axis=2)


def _conv(x, K, pad_h, pad_w, stride=1, dims=("NHWC", "HWIO", "NHWC")):
    return jax.lax.conv_general_dilated(
        x, K, (stride, stride), (pad_h, pad_w), dimension_numbers=dims)


@lru_cache(maxsize=None)
def _m_overlap_s1(k: int):
    """Stride-1 SAME conv recast as an *overlapped* stride-2 conv, phase-packed output.

    out[2u+p] = sum_a in[2u + (p+a) - h]  =>  one (k+1)-tap stride-2 conv with
    K'[a', p, a] = delta(a == a'-p); FLOP overhead (k+1)^2/k^2 (k3: 1.78x, k7: 1.31x) —
    far below the aligned-cell phase form, because windows need not align to cells.
    """
    M = np.zeros((k + 1, 1, 2, k), np.float32)
    for ap in range(k + 1):
        for p in range(2):
            a = ap - p
            if 0 <= a < k:
                M[ap, 0, p, a] = 1.0
    return M


@lru_cache(maxsize=None)
def _m_overlap_s2(k: int):
    """Stride-2 SAME conv recast as an overlapped stride-4 conv, phase-packed output.

    out[2U+P] = sum_a in[4U + (2P+a) - pad_beg]  =>  (k+2)-tap stride-4 conv with
    K'[a', P, a] = delta(a == a'-2P).  (cnv1: 9x9/s4, K=243, N=128.)
    """
    M = np.zeros((k + 2, 1, 2, k), np.float32)
    for ap in range(k + 2):
        for P in range(2):
            a = ap - 2 * P
            if 0 <= a < k:
                M[ap, 0, P, a] = 1.0
    return M


def conv_s1_overlapped(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv on a direct-layout [B,H,W,ci] (H, W even), returning the
    phase-packed output [B,H/2,W/2,4co].  Exact; overhead ((k+1)/k)^2 FLOPs."""
    k = w.shape[0]
    h = (k - 1) // 2
    M = _m_overlap_s1(k)
    K = _phase_kernel(w, M, M)  # (k+1, k+1, ci, 4co)
    return _conv(x, K, (h, h), (h, h), stride=2)


def conv_s2_overlapped(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 SAME conv on a direct-layout [B,H,W,ci] (H, W divisible by 4),
    returning the phase-packed output [B,H/4,W/4,4co] (= packed (H/2,W/2,co))."""
    B, H, W, _ = x.shape
    k = w.shape[0]
    out_h, out_w = H // 2, W // 2
    pb_h = max((out_h - 1) * 2 + k - H, 0) // 2
    pb_w = max((out_w - 1) * 2 + k - W, 0) // 2
    M = _m_overlap_s2(k)
    K = _phase_kernel(w, M, M)  # (k+2, k+2, ci, 4co)
    # rows needed: 4U + a' - pad_beg, U in [0,H/4): VALID needs padded >= 4(H/4-1)+k+2
    pe_h = 4 * (H // 4 - 1) + k + 2 - H - pb_h
    pe_w = 4 * (W // 4 - 1) + k + 2 - W - pb_w
    return _conv(x, K, (pb_h, pe_h), (pb_w, pe_w), stride=4)


def deconv3x3_s2_phase(x: jnp.ndarray, w_tf: jnp.ndarray, merge: bool = True) -> jnp.ndarray:
    """Exact ``tf.nn.conv2d_transpose(k=3, s=2, SAME)`` (cf. models/layers.py
    TFConvTranspose) as one dense 2x2 conv.

    ``w_tf``: (3, 3, co, ci) — the TF transpose-kernel layout the checkpoints store.
    Returns [B,2H,2W,co] when ``merge`` else the phase-packed [B,H,W,4co].
    """
    M, pad_b, pad_a = _m_deconv3()
    w = jnp.transpose(w_tf, (0, 1, 3, 2))  # -> (3,3,ci,co)
    K = _phase_kernel(w, M, M)  # (2,2, 1*1*ci, 4co)
    y = _conv(x, K, (pad_b, pad_a), (pad_b, pad_a))
    return depth_to_space(y) if merge else y


def conv_s1_phase(x_ph: jnp.ndarray, w: jnp.ndarray,
                  group_sizes: Sequence[int] | None = None) -> jnp.ndarray:
    """Stride-1 SAME conv at resolution 2H x 2W, computed on the phase-packed tensor.

    ``x_ph``: [B,H,W,4*ci] — concat of (p,q,c)-packed groups summing to ci channels.
    ``w``: (k, k, ci, co) HWIO.  Returns the phase-packed output [B,H,W,4*co].
    """
    k = w.shape[0]
    M, pad_b, pad_a = _m_s1(k)
    K = _phase_kernel(w, M, M)
    if group_sizes is not None and len(group_sizes) > 1:
        K = _regroup_in_channels(K, group_sizes, rs=4)
    return _conv(x_ph, K, (pad_b, pad_a), (pad_b, pad_a))


def conv_s2_from_phase(
    x_ph: jnp.ndarray, w: jnp.ndarray, full_in_hw, bias=None
) -> jnp.ndarray:
    """Stride-2 SAME conv whose input arrives phase-packed; output in normal layout.

    ``full_in_hw`` is the (even) full-resolution spatial shape the packed input encodes —
    needed because TF SAME padding for stride 2 depends on the true input size.

    ``bias`` (optional, [co]): added to every output INSIDE the convolution, by
    appending a ones input channel whose kernel tap (pb_h, pb_w) — cell offset 0,
    which reads output cell y itself, never a padded cell — carries the bias
    vector.  Exact, and avoids the XLA:TPU epilogue-add fusion break measured for
    non-splat constants on this conv (see ``infer/fast.py`` ``conv_bias_folded``).
    """
    k = w.shape[0]
    H, W = full_in_hw
    out_h, out_w = -(-H // 2), -(-W // 2)
    pad_h = max((out_h - 1) * 2 + k - H, 0) // 2
    pad_w = max((out_w - 1) * 2 + k - W, 0) // 2
    Mh, pb_h, pa_h = _m_s2_from_phase(k, pad_h)
    Mw, pb_w, pa_w = _m_s2_from_phase(k, pad_w)
    K = _phase_kernel(w, Mh, Mw)
    if bias is not None:
        Kb = jnp.zeros((K.shape[0], K.shape[1], 1, K.shape[3]), K.dtype)
        Kb = Kb.at[pb_h, pb_w, 0, :].set(bias.astype(K.dtype))
        K = jnp.concatenate([K, Kb], axis=2)
        x_ph = jnp.concatenate([x_ph, jnp.ones_like(x_ph[..., :1])], -1)
    return _conv(x_ph, K, (pb_h, pa_h), (pb_w, pa_w))


def stem_conv_s2_phase(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 SAME conv on a raw image, producing a phase-packed output.

    Input [B,H,W,ci] with H, W divisible by 4; ``w`` (k,k,ci,co), k=7 (cnv1,
    ``nets_optflow_depth.py:93``).  The image is padded and 4x space-to-depth'd so the
    contraction dim becomes 16*ci and the output dim 4*co — both MXU-sized even for the
    3-channel RGB stem.  Returns [B,H/4,W/4,4co] = the phase-packed (H/2,W/2,co) output.
    """
    B, H, W, Ci = x.shape
    k = w.shape[0]
    out_h, out_w = H // 2, W // 2
    pad_h = max((out_h - 1) * 2 + k - H, 0) // 2
    pad_w = max((out_w - 1) * 2 + k - W, 0) // 2
    Mh, pb_h, pa_h = _m_stem(k, pad_h)
    Mw, pb_w, pa_w = _m_stem(k, pad_w)
    # pad so that padded row 4*cell + r covers original row index range [-pad, H+..) and
    # the padded height is a multiple of 4 wide enough for cells 0..H/4-1+pa.
    need_h = (out_h // 2 + pa_h) * 4
    need_w = (out_w // 2 + pa_w) * 4
    xp = jnp.pad(x, ((0, 0), (pad_h, need_h - H - pad_h), (pad_w, need_w - W - pad_w),
                     (0, 0)))
    # 4-way s2d: [B, need_h/4, need_w/4, 16*Ci] with (r, s, c) order
    Hc, Wc = need_h // 4, need_w // 4
    xs = xp.reshape(B, Hc, 4, Wc, 4, Ci).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hc, Wc, 16 * Ci)
    K = _phase_kernel(w, Mh, Mw)  # (Eh, Ew, 4*4*Ci, 4co)
    return _conv(xs, K, (pb_h, 0), (pb_w, 0))[:, : out_h // 2, : out_w // 2]


def bilinear_up2_phase(img: jnp.ndarray) -> jnp.ndarray:
    """Phase-packed exact TF1 x2 bilinear upsample (cf. ops/resize.py
    ``_up2_bilinear_axis``): out phases (ee, eo, oe, oo) of resize_bilinear(img, 2x).

    img: [B,H,W,C] -> [B,H,W,4C] (p,q,c)-packed; odd taps clamp at the last row/col.
    """
    def nxt(x, axis):
        last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), last], axis=axis)

    sx = nxt(img, 2)
    sy = nxt(img, 1)
    sxy = nxt(sy, 2)
    ee = img
    eo = 0.5 * (img + sx)
    oe = 0.5 * (img + sy)
    oo = 0.25 * (img + sx + sy + sxy)
    return jnp.concatenate([ee, eo, oe, oo], axis=-1)
