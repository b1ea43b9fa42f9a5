"""MXU-scheduled inference forward for DispNet (the production predict path).

``fast_depth_forward`` evaluates the depth4-family DispNet (reference
``nets_optflow_depth.py:76-147``) from a standard checkpoint tree
(``DispNet.init/apply`` variables), replacing the MXU-hostile layers with the exact
phase-space rewrites from ``ops/phase.py``.  The production default (the measured
whole-graph optimum — ROADMAP round-2 campaign) is ``stem="overlap",
deconv="native", tail="overlap"``:

  * overlap stem — cnv1b (7x7/s1 on 32ch) as an overlapped 8x8/s2 conv
    (K=2048/N=128, 1.31x FLOPs); cnv2 consumes the packed tensor directly.
  * overlap tail — icnv1 as an overlapped 4x4/s2 conv (packed N=64) and disp1 on
    the packed tensor; only upcnv1's output and the 17-ch concat exist full-res.

The other modes (aligned-phase stem/tail, phase deconvs, hybrid packed-cnv2b stem,
Pallas fused tail) are kept as measured alternatives — every one is exact and
parity-tested, and every one measured slower whole-graph (see ROADMAP).

Batch-norm is folded INTO THE WEIGHTS: eval-mode slim ``scale=False`` BN is
y = x*rsqrt(var+eps) + (bias - mean*rsqrt(var+eps)); the multiplicative part is
applied to the conv kernel's output channels at trace time (pure constant math —
XLA folds it at compile time), leaving only a shift that fuses into the conv
epilogue.  This matters beyond saving one multiply: with *realistic* (non-init)
running stats the per-channel affine constants are non-splat vectors, and XLA
compiles the unfolded graph ~24% slower (48.0 vs 38.8 ms/batch at 576x384 b128 —
measured, tools/probe layout study round 3); weight folding makes the compiled
graph value-independent.  All rewrites are bit-exact up to float reassociation —
locked against ``DispNet.apply`` by ``tests/test_fast_infer.py``.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.ops.phase import (
    bilinear_up2_phase,
    conv_s1_overlapped,
    conv_s1_phase,
    conv_s2_from_phase,
    deconv3x3_s2_phase,
    depth_to_space,
    space_to_depth,
    stem_conv_s2_phase,
)
from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like


def _affine(params, stats, name):
    """Eval-mode slim batch_norm (center-only) as (scale, shift) float32 vectors."""
    var = stats[name]["BatchNorm_0"]["var"]
    mean = stats[name]["BatchNorm_0"]["mean"]
    bias = params[name]["BatchNorm_0"]["bias"]
    s = jax.lax.rsqrt(var + 1e-3)
    return s, bias - mean * s


def _tile4(v):
    return jnp.tile(v, 4)  # phase-packed channels are (p, q, c) — c fastest


def _bias_fold_kernel(w, t, in_hw, stride):
    """Augment a [kh, kw, ci, co] kernel so conv([x, 1], w_aug) == conv(x, w) + t.

    The bias vector ``t`` rides an appended ones-input-channel at kernel tap
    (pad_top, pad_top), which under SAME padding reads input index ``stride*i``
    for every output i — always in bounds when in_hw divides by ``stride`` (the
    caller asserts this) — so the fold is exact.  Shared by the DispNet
    (``conv_bias_folded``) and DepthPoseNet (``fast_pose.conv_stem``) stems; see
    ``conv_bias_folded`` for why the shift must live inside the convolution.
    """
    kh, kw = w.shape[:2]
    in_h, in_w = in_hw
    tap_h = max((in_h // stride - 1) * stride + kh - in_h, 0) // 2
    tap_w = max((in_w // stride - 1) * stride + kw - in_w, 0) // 2
    w_aug = jnp.zeros((kh, kw, w.shape[2] + 1, w.shape[3]), w.dtype)
    return w_aug.at[:, :, :-1, :].set(w).at[tap_h, tap_w, -1, :].set(t)


def conv_bias_folded_op(x, kernel, scale, shift, stride, dtype):
    """relu(conv(x, kernel*scale) + shift) with BOTH affine terms inside the conv.

    The scale folds into the kernel's output channels; the shift rides an
    appended ones-input-channel via ``_bias_fold_kernel`` — exact when H, W
    divide by ``stride`` (callers assert this).

    This exists because XLA:TPU compiles the plain epilogue add ~11 ms/batch
    slower when the shift is a non-splat vector (i.e. for every REAL checkpoint)
    for the low-channel stem convs specifically: measured 49.6 -> 39.1 ms/batch
    at 576x384 b128 by moving cnv1's shift into the conv (round-3 probe study;
    deep encoder / decoder epilogue adds are free).  The ONE shared
    implementation behind the DispNet (``fast.conv_bias_folded``) and
    DepthPoseNet (``fast_pose.conv_stem``) stems.
    """
    w_aug = _bias_fold_kernel(kernel * scale, shift, x.shape[1:3], stride)
    x1 = jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)
    y = jax.lax.conv_general_dilated(
        x1, w_aug.astype(dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y)


def fast_depth_forward(
    variables: Dict[str, Any],
    image: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
    stem: str = "overlap",
    deconv: str = "native",
    mid: str = "native",
    tail: str = "overlap",
    disp_scaling: float = 4.0,
    min_disp: float = 0.0,
    split_concat: bool = False,
    stop_at: str = "",
) -> List[jnp.ndarray]:
    """Eval-mode DispNet forward; returns [d1, d2, d3, d4] (float32).

    ``image``: [B, H, W, C] with H, W divisible by 4 (the reference operating points —
    576x384 / 256x192 — all qualify).  Matches ``DispNet(variant, dtype).apply(...,
    train=False)`` for BN variants (depth4 / sfm-style single decoder).
    """
    assert stem in ("native", "phase", "overlap", "hybrid"), stem
    assert deconv in ("native", "phase"), deconv
    assert mid in ("native", "overlap", "phase"), mid
    assert tail in ("native", "phase", "overlap", "pallas"), tail
    deconv_mode, mid_mode, tail_mode = deconv, mid, tail
    enc_p = variables["params"]["encoder"]
    enc_s = variables["batch_stats"]["encoder"]
    dec_p = variables["params"]["decoder"]
    dec_s = variables["batch_stats"]["decoder"]
    H, W = image.shape[1:3]
    if stem != "native" or tail != "native" or mid != "native":
        # phase/overlap stems and tails 2x2-pack pixels twice; odd sizes would
        # mis-slice with cryptic shape errors deep in ops/phase.py
        assert H % 4 == 0 and W % 4 == 0, (
            f"stem={stem!r}/mid={mid!r}/tail={tail!r} require H, W divisible by 4, "
            f"got {H}x{W}")
    dt = dtype

    def cw(tree, name):  # raw conv kernel (disp heads: bias, no BN), compute dtype
        return tree[name]["Conv_0"]["kernel"].astype(dt)

    def enc_w(name):  # encoder conv kernel with the BN scale folded in (HWIO: O last)
        s, _ = _affine(enc_p, enc_s, name)
        return (enc_p[name]["Conv_0"]["kernel"] * s).astype(dt)

    def dec_w(name):  # decoder iconv kernel, BN scale folded
        s, _ = _affine(dec_p, dec_s, name)
        return (dec_p[name]["Conv_0"]["kernel"] * s).astype(dt)

    def dw(name):  # deconv kernel (TF transpose layout [kh, kw, O, I]), scale folded
        s, _ = _affine(dec_p, dec_s, name)
        return (dec_p[name]["TFConvTranspose_0"]["kernel"] * s[:, None]).astype(dt)

    def aff(x, params, stats, name, tiled=False):
        # shift-only: the BN scale already lives in the kernel (enc_w/dec_w/dw)
        _, t = _affine(params, stats, name)
        if tiled:
            t = _tile4(t)
        return jax.nn.relu(x + t.astype(dt))

    def conv(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_bias_folded(x, tree_p, tree_s, name, stride):
        s, t = _affine(tree_p, tree_s, name)
        return conv_bias_folded_op(
            x, tree_p[name]["Conv_0"]["kernel"], s, t, stride, dt)

    def enc_block(x, i, stride2_fn, stride1_fn):
        x = stride2_fn(x)
        x = aff(x, enc_p, enc_s, f"cnv{i}")
        x = stride1_fn(x)
        return aff(x, enc_p, enc_s, f"cnv{i}b")

    x = image.astype(dt)
    skips = []
    if stem in ("phase", "overlap", "hybrid"):
        if stem == "phase":
            # cnv1 + cnv1b both on aligned phase cells (2.04x FLOPs for cnv1b)
            c1_ph = stem_conv_s2_phase(x, enc_w("cnv1"))
            c1_ph = aff(c1_ph, enc_p, enc_s, "cnv1", tiled=True)
            if stop_at == "cnv1":
                return [c1_ph]
            c1b_ph = conv_s1_phase(c1_ph, enc_w("cnv1b"))
        elif stem == "hybrid":
            # like "overlap", plus cnv2b in overlapped form (below).  A phase-packed
            # cnv1 was measured at parity with the native conv (5.08 vs 5.02 ms —
            # XLA re-places the layout cost, profile_fast.py), so cnv1 stays native.
            # cnv2b's overlapped form needs the post-cnv2 tensor (H/4, W/4) even:
            assert H % 8 == 0 and W % 8 == 0, (
                f"hybrid stem needs H, W divisible by 8, got {H}x{W}")
            c1 = conv_bias_folded(x, enc_p, enc_s, "cnv1", 2)
            if stop_at == "cnv1":
                return [c1]
            c1b_ph = conv_s1_overlapped(c1, enc_w("cnv1b"))
        else:
            # cnv1 native (direct layout), cnv1b as an overlapped 8x8/s2 conv
            # (1.31x FLOPs, K=2048/N=128 vs the native K=1568/N=32 lowering)
            c1 = conv_bias_folded(x, enc_p, enc_s, "cnv1", 2)
            if stop_at == "cnv1":
                return [c1]
            c1b_ph = conv_s1_overlapped(c1, enc_w("cnv1b"))
        c1b_ph = aff(c1b_ph, enc_p, enc_s, "cnv1b", tiled=True)
        skips.append(("phase", c1b_ph))
        if stop_at == "cnv1b":
            return [c1b_ph]
        _, t2 = _affine(enc_p, enc_s, "cnv2")
        x = jax.nn.relu(conv_s2_from_phase(
            c1b_ph, enc_w("cnv2"), (H // 2, W // 2), bias=t2))
        if stop_at == "cnv2":
            return [x, c1b_ph]
        if stem == "hybrid":
            # cnv2b overlapped (N 64 -> 256 packed: full MXU lanes, 2.9 vs 4.6 ms
            # measured), unpacked immediately — a packed skip and a from-phase cnv3
            # were both measured slower (layout-propagation costs downstream)
            c2b_ph = conv_s1_overlapped(x, enc_w("cnv2b"))
            c2b_ph = aff(c2b_ph, enc_p, enc_s, "cnv2b", tiled=True)
            x = depth_to_space(c2b_ph)
        else:
            x = conv(x, enc_w("cnv2b"))
            x = aff(x, enc_p, enc_s, "cnv2b")
        skips.append(("full", x))
        start = 3
    else:
        if stop_at:
            raise ValueError("stop_at probes are not implemented for stem='native'")
        start = 1
    if stop_at == "stem":        # cumulative-cost probe (tools/profile_fast.py)
        return [t for _k, t in skips]
    for i in range(start, 8):
        x = enc_block(
            x, i,
            lambda y, i=i: conv(y, enc_w(f"cnv{i}"), 2),
            lambda y, i=i: conv(y, enc_w(f"cnv{i}b"), 1),
        )
        skips.append(("full", x))
    if stop_at == "encoder":
        return [skips[-1][1]]

    def skip_full(j):  # 0-based encoder level
        kind, t = skips[j]
        return depth_to_space(t) if kind == "phase" else t

    def deconv(x, name):
        if deconv_mode == "phase":
            y = deconv3x3_s2_phase(x, dw(name), merge=True)
        else:
            y = jax.lax.conv_transpose(
                x, dw(name), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
        return aff(y, dec_p, dec_s, name)

    def iconv(x, name):
        return aff(conv(x, dec_w(name)), dec_p, dec_s, name)

    def iconv_cat(xs, name):
        """icnv over a concat.  ``split_concat``: conv(cat(xs)) == sum of per-input
        convs (contraction linearity) -- skips materializing the concat tensor
        (largest at the full/half-res stages), at the cost of k extra conv calls."""
        if not split_concat or len(xs) == 1:
            return iconv(jnp.concatenate(xs, -1), name)
        w = dec_w(name)
        off, y = 0, None
        for x in xs:
            c = x.shape[-1]
            part = conv(x, w[:, :, off : off + c, :])
            y = part if y is None else y + part
            off += c
        return aff(y, dec_p, dec_s, name)

    def head(x, name):
        w = cw(dec_p, name)
        b = dec_p[name]["Conv_0"]["bias"].astype(dt)
        y = jax.nn.sigmoid(conv(x, w) + b)
        return (disp_scaling * y + min_disp).astype(jnp.float32)

    cat = lambda xs: jnp.concatenate(xs, -1)

    x = deconv(skip_full(6), "upcnv7")
    x = resize_like(x, skip_full(5))
    x = iconv_cat([x, skip_full(5)], "icnv7")
    x = deconv(x, "upcnv6")
    x = resize_like(x, skip_full(4))
    x = iconv_cat([x, skip_full(4)], "icnv6")
    x = deconv(x, "upcnv5")
    x = resize_like(x, skip_full(3))
    x = iconv_cat([x, skip_full(3)], "icnv5")
    x = deconv(x, "upcnv4")
    x = resize_like(x, skip_full(2))
    x = iconv_cat([x, skip_full(2)], "icnv4")
    d4 = head(x, "disp4")
    d4u = resize_bilinear(d4, (H // 4, W // 4))
    x = deconv(x, "upcnv3")
    x = resize_like(x, skip_full(1))
    x = iconv_cat([x, skip_full(1), d4u.astype(dt)], "icnv3")
    d3 = head(x, "disp3")
    if stop_at == "d3":
        return [d3, d4]

    def head_phase(y_ph, name):
        d_ph = conv_s1_phase(y_ph, cw(dec_p, name))
        d_ph = d_ph + dec_p[name]["Conv_0"]["bias"].astype(dt)
        return (disp_scaling * jax.nn.sigmoid(d_ph) + min_disp).astype(jnp.float32)

    if mid_mode == "native":
        d3u = resize_bilinear(d3, (H // 2, W // 2))
        x = deconv(x, "upcnv2")
        c1 = skip_full(0)
        x = resize_like(x, c1)
        x2 = iconv_cat([x, c1, d3u.astype(dt)], "icnv2")
        d2 = head(x2, "disp2")
    elif mid_mode == "overlap":
        # icnv2 as an overlapped 4x4/s2 conv (N 32 -> 128 packed: full MXU lanes
        # instead of 4x pad waste) and disp2 from the packed tensor; upcnv2 and the
        # 65-ch concat stay at H/2 x W/2.
        d3u = resize_bilinear(d3, (H // 2, W // 2))
        x = deconv(x, "upcnv2")
        c1 = skip_full(0)
        x = resize_like(x, c1)
        y_ph = conv_s1_overlapped(cat([x, c1, d3u.astype(dt)]), dec_w("icnv2"))
        y_ph = aff(y_ph, dec_p, dec_s, "icnv2", tiled=True)
        d2 = depth_to_space(head_phase(y_ph, "disp2"))
        x2 = depth_to_space(y_ph)
    else:
        # fully phase-packed mid block: upcnv2 deconv, the cnv1b skip, the d3
        # upsample, icnv2, and disp2 all stay 2x2-packed — nothing materializes at
        # H/2 x W/2 until the unpack feeding the tail.
        up_ph = deconv3x3_s2_phase(x, dw("upcnv2"), merge=False)
        up_ph = aff(up_ph, dec_p, dec_s, "upcnv2", tiled=True)
        kind, c1t = skips[0]
        c1_ph = c1t if kind == "phase" else space_to_depth(c1t)
        d3u_ph = bilinear_up2_phase(d3).astype(dt)
        cat_ph = jnp.concatenate([up_ph, c1_ph, d3u_ph], -1)
        y_ph = conv_s1_phase(cat_ph, dec_w("icnv2"), group_sizes=(32, 32, 1))
        y_ph = aff(y_ph, dec_p, dec_s, "icnv2", tiled=True)
        d2 = depth_to_space(head_phase(y_ph, "disp2"))
        x2 = depth_to_space(y_ph)
    if stop_at == "d2":
        return [d2, d3, d4]

    if tail_mode == "native":
        d2u = resize_bilinear(d2, (H, W))
        x = deconv(x2, "upcnv1")
        if x.shape[1:3] != (H, W):
            x = resize_like(x, d2u)
        x = iconv_cat([x, d2u.astype(dt)], "icnv1")
        d1 = head(x, "disp1")
        return [d1, d2, d3, d4]

    if tail_mode == "pallas":
        from tf_depth_estimation_tpu.ops.pallas_tail import (
            fused_tail, prepare_tail_params)
        tp = prepare_tail_params(
            dec_p["upcnv1"]["TFConvTranspose_0"]["kernel"].astype(jnp.float32),
            _affine(dec_p, dec_s, "upcnv1"),
            dec_p["icnv1"]["Conv_0"]["kernel"],
            _affine(dec_p, dec_s, "icnv1"),
            dec_p["disp1"]["Conv_0"]["kernel"],
            dec_p["disp1"]["Conv_0"]["bias"][0],
            dt)
        d1_ph = fused_tail(x2, d2, tp, disp_scaling=disp_scaling, min_disp=min_disp)
        return [depth_to_space(d1_ph), d2, d3, d4]

    if tail_mode == "overlap":
        # upcnv1 native, icnv1 as an overlapped 4x4/s2 conv (packed out, N=64 instead
        # of the native N=16), disp1 from the packed tensor — the only full-resolution
        # intermediates are upcnv1's output and the 17-channel concat.
        d2u = resize_bilinear(d2, (H, W))
        x = deconv(x2, "upcnv1")
        if x.shape[1:3] != (H, W):
            x = resize_like(x, d2u)
        w_i1 = dec_w("icnv1")
        if split_concat:
            cx = x.shape[-1]
            y_ph = (conv_s1_overlapped(x, w_i1[:, :, :cx, :])
                    + conv_s1_overlapped(d2u.astype(dt), w_i1[:, :, cx:, :]))
        else:
            y_ph = conv_s1_overlapped(cat([x, d2u.astype(dt)]), w_i1)
        y_ph = aff(y_ph, dec_p, dec_s, "icnv1", tiled=True)
        return [depth_to_space(head_phase(y_ph, "disp1")), d2, d3, d4]

    # --- fused phase tail: nothing full-resolution until the last depth-to-space ---
    up1_ph = deconv3x3_s2_phase(x2, dw("upcnv1"), merge=False)  # [B,H/2,W/2,64]
    up1_ph = aff(up1_ph, dec_p, dec_s, "upcnv1", tiled=True)
    d2u_ph = bilinear_up2_phase(d2).astype(dt)                  # [B,H/2,W/2,4]
    cat_ph = jnp.concatenate([up1_ph, d2u_ph], -1)
    y_ph = conv_s1_phase(cat_ph, dec_w("icnv1"), group_sizes=(16, 1))
    y_ph = aff(y_ph, dec_p, dec_s, "icnv1", tiled=True)
    return [depth_to_space(head_phase(y_ph, "disp1")), d2, d3, d4]
