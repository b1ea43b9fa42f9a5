"""TPU-first inference-optimized depth network — the "turbo" architecture track.

This is NOT a reference component: every reference ``disp_net`` variant is ported
exactly in ``models/dispnet.py``, and the exact-parity graph's measured optimum is
~3.3k frames/s on a v5e — bounded near ~5.2k by its own bf16 roofline (ROADMAP.md
"Performance state").  ``TurboDepthNet`` is the documented architecture-change route
past that bound (ROADMAP "Remaining candidates" item 2): the same task contract as
the flagship ``disp_net`` (a sigmoid*4 disparity pyramid from an RGB frame —
reference ``nets_optflow_depth.py:76-147``), re-designed so every convolution is
MXU-shaped from the start instead of rewritten after the fact:

  * **space-to-depth patchify stem** (patch 4): the parity graph burns ~40% of its
    time in the 3..64-channel full/half-resolution stem at <25% MXU utilization;
    here the frame is losslessly repacked to ``H/4 x W/4 x 48`` and the first conv
    is a 3x3 with a 432-wide contraction dim.
  * **channels >= 96 everywhere, nothing above 1/4 resolution**: no stage pays the
    low-N 128-lane padding tax the parity decoder tail pays.
  * **FPN-style decoder**: subpixel upsamples (1x1 conv -> depth-to-space, the dense
    formulation ROADMAP measured fastest for the parity deconvs) and ADD-fused 1x1
    laterals — no channel-concat tensors to round-trip through HBM.
  * **subpixel disparity head**: 3x3 -> patch^2 channels at 1/4 resolution, then a
    free depth-to-space to full resolution — the parity graph's most expensive
    region (full-res N=16/N=1 convs) does not exist here.

Weights come from distillation against a trained ``depth4`` teacher
(``train/distill.py``): the student matches the teacher's 4-scale sigmoid*4 output
pyramid, so it drops into every depth4 serving surface.  Accuracy is bounded by the
teacher and must be validated per deployment — this family is opt-in and never the
parity path (``bench.py`` keeps measuring the exact-parity graph; the turbo number
is reported separately by ``tools/bench_turbo.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tf_depth_estimation_tpu.models.layers import SlimConv
from tf_depth_estimation_tpu.ops.phase import depth_to_space_n, space_to_depth_n


@dataclasses.dataclass(frozen=True)
class TurboVariant:
    """Static configuration of the turbo family.

    ``patch`` is both the stem space-to-depth factor and the head subpixel factor;
    inputs must be divisible by ``patch * 2**(len(widths)-1)`` in H and W
    (384x576 with the defaults: 96x144 base grid, 12x18 at the deepest stage).
    """

    name: str
    patch: int = 4
    widths: Tuple[int, ...] = (96, 192, 384, 384)  # encoder channels, 1/4 .. 1/32 res
    fpn_width: int = 128                           # decoder channels at every level
    head_scale: float = 4.0                        # sigmoid*4, matching depth4 heads
    head_offset: float = 0.0
    bn_momentum: float = 0.99
    # disp-head conv kernel. 3 matches the parity nets' head idiom; 1 removes the
    # head's 8x MXU lane-pad tax (N = patch^2 = 16 channels at the base grid — the
    # single largest padded-FLOPs item of the small serving graph, ~20% of its MXU
    # time) while the receptive field stays covered by the 3x3 fuse conv it reads.
    head_kernel: int = 3
    # number of stride-1 stem convs at the base grid (1 or 2).  The base grid is
    # where the padded-FLOPs cost lives for the narrow variants: a 64-channel 3x3
    # at 96x144 pads K and N to the 128x128 MXU (4x waste, ~2.7 ms/b128 each on
    # v5e), and small/sprint carry three such convs (stem, stemb, fuse1) — ~60%
    # of the whole 13.3 ms graph.  stem_convs=1 removes one of them.
    stem_convs: int = 2
    # kernel of the level-1 (base-grid) decoder fuse conv.  3 everywhere else; 1
    # removes the other ~4x-padded base-grid 3x3 (see stem_convs) at the cost of
    # base-grid receptive field (the stem 3x3 + the upsampled deeper path then
    # carry all spatial mixing at that grid).
    fuse1_kernel: int = 3
    # convs per stride-2 encoder stage (1 or 2).  2 = stride-2 conv + stride-1
    # refinement conv (the parity encoder's cnvN/cnvNb idiom); 1 drops the
    # refinement convs — after the base-grid cuts (stem_convs/fuse1_kernel) the
    # enc*b convs are the largest remaining non-structural cost of the narrow
    # presets (round-4 distill evidence: task accuracy after distillation is
    # teacher-bounded, not capacity-bounded, across the whole shipped ladder).
    enc_convs: int = 2

    # class attr, not a dataclass field
    PRESETS = ("base", "small", "wide", "colon", "sprint", "nano", "pico",
               "femto", "atto")

    def __post_init__(self):
        assert self.patch in (2, 4), "subpixel d2 head needs an even patch"
        assert len(self.widths) >= 2
        assert self.stem_convs in (1, 2)
        assert self.enc_convs in (1, 2)

    @staticmethod
    def by_name(name: str) -> "TurboVariant":
        """Preset lookup with a clean error (CLIs pass user input here)."""
        if name not in TurboVariant.PRESETS:
            raise ValueError(
                f"unknown turbo variant {name!r}; choose from {TurboVariant.PRESETS}")
        return getattr(TurboVariant, name)()

    @staticmethod
    def base() -> "TurboVariant":
        """Default operating point: ~18.5 GFLOP/frame at 384x576 (vs parity ~38)."""
        return TurboVariant("base")

    @staticmethod
    def small() -> "TurboVariant":
        """Throughput-first: ~9 GFLOP/frame at 384x576."""
        return TurboVariant("small", widths=(64, 128, 256, 256), fpn_width=96)

    @staticmethod
    def wide() -> "TurboVariant":
        """Quality headroom for distillation: ~33 GFLOP/frame at 384x576."""
        return TurboVariant("wide", widths=(128, 256, 512, 512), fpn_width=160)

    @staticmethod
    def sprint() -> "TurboVariant":
        """Serving-speed point: ``small`` widths with the 1x1 disparity head —
        the measured padded-FLOPs optimum of the family at 576x384 (the 3x3
        16-channel head is ~20% of ``small``'s MXU time for ~4% of its FLOPs)."""
        return TurboVariant("sprint", widths=(64, 128, 256, 256), fpn_width=96,
                            head_kernel=1)

    @staticmethod
    def nano() -> "TurboVariant":
        """Past-the-north-star point: ``sprint`` minus the second stem conv —
        the padded-FLOPs model says the base grid's three 128-padded 3x3 convs
        dominate sprint's wall clock, and this is the one whose removal costs
        only stem depth (the lateral + fuse path still mixes the base grid)."""
        return TurboVariant("nano", widths=(64, 128, 256, 256), fpn_width=96,
                            head_kernel=1, stem_convs=1)

    @staticmethod
    def pico() -> "TurboVariant":
        """``nano`` with a 1x1 level-1 fuse conv — the last 4x-padded base-grid
        3x3 removed.  11,867.6 fps/chip at 576x384 b128 on v5e (recorded
        artifact BENCH_turbo_r04.json) vs nano 10,504.4; capacity-probe before
        deploying (base-grid spatial mixing rests on the single stem 3x3).
        ``femto`` below is the faster, thinner point."""
        return TurboVariant("pico", widths=(64, 128, 256, 256), fpn_width=96,
                            head_kernel=1, stem_convs=1, fuse1_kernel=1)

    @staticmethod
    def femto() -> "TurboVariant":
        """``pico`` minus the encoder refinement convs (enc2b/enc3b/enc4b) — the
        largest remaining non-structural cost after the base-grid cuts.  Fastest
        measured point: 12,916.5 fps/chip at 576x384 b128 on v5e
        (BENCH_turbo_r04.json) vs pico 11,867.6.  Distilled task accuracy stays
        teacher-beating (abs-rel vs GT 0.0668 vs the teacher's 0.0718,
        DISTILL_r04.json) though its vs-teacher tracking is the first outside
        the family band (0.0365 vs 0.0332-0.0338); capacity probe 0.166 holdout
        MAE sits between nano and pico.  Validate per deployment — spatial
        mixing is down to one 3x3 per grid."""
        return TurboVariant("femto", widths=(64, 128, 256, 256), fpn_width=96,
                            head_kernel=1, stem_convs=1, fuse1_kernel=1,
                            enc_convs=1)

    @staticmethod
    def atto() -> "TurboVariant":
        """``femto`` with a 64-channel FPN decoder — the probe that revealed the
        decoder (96-ch fuse/up convs) as the biggest remaining cost of the thin
        presets: 18,233.8 fps/chip at 576x384 b256 on v5e (BENCH_turbo_r04.json;
        +41% over femto, 1.82x the 10k north star).  Validate per deployment —
        function-matching capacity is the ladder's thinnest."""
        return TurboVariant("atto", widths=(64, 128, 256, 256), fpn_width=64,
                            head_kernel=1, stem_convs=1, fuse1_kernel=1,
                            enc_convs=1)

    @staticmethod
    def colon() -> "TurboVariant":
        """3-stage variant whose divisibility (16) fits the colon operating point
        (240x720, ref ``train_depth_only.py:21-25``): 240 and 720 are not divisible
        by the default 4 stages' 32."""
        return TurboVariant("colon", widths=(96, 192, 384))

    def min_hw_multiple(self) -> int:
        return self.patch * 2 ** (len(self.widths) - 1)


class TurboDepthNet(nn.Module):
    """Multi-scale disparity network with the depth4 output contract.

    Returns ``[d1, d2, d3, d4]`` — sigmoid*4 disparity at full, 1/2, 1/4 and 1/8
    resolution (float32, like ``DispNet``) — or just ``[d1]`` when
    ``full_only=True`` (the serving graph; the aux heads exist for training-time
    multi-scale distillation/supervision only).
    """

    variant: TurboVariant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True, full_only: bool = False):
        v = self.variant
        p = v.patch
        H, W = image.shape[1:3]
        m = v.min_hw_multiple()
        assert H % m == 0 and W % m == 0, (
            f"turbo-{v.name} needs H, W divisible by {m}, got {H}x{W}")

        def conv(x, feat, name, *, stride=1, kernel=3, act=True, bn=True):
            return SlimConv(
                feat, (kernel, kernel), stride=stride, use_bn=bn,
                bn_momentum=v.bn_momentum, activation=nn.relu if act else None,
                dtype=self.dtype, name=name,
            )(x, train)

        x = space_to_depth_n(image.astype(self.dtype), p)

        # Encoder: stride-1 stem pair at the 1/patch base grid, then stride-2 stages.
        feats = []
        x = conv(x, v.widths[0], "stem")
        if v.stem_convs == 2:
            x = conv(x, v.widths[0], "stemb")
        feats.append(x)
        for i, w in enumerate(v.widths[1:], start=2):
            x = conv(x, w, f"enc{i}", stride=2)
            if v.enc_convs == 2:
                x = conv(x, w, f"enc{i}b")
            feats.append(x)

        # FPN decoder: top-down subpixel upsample + add-lateral + 3x3 fuse.
        f = v.fpn_width
        y = conv(feats[-1], f, "lat%d" % len(feats), kernel=1, act=False)
        levels = {}  # level index (1 = base grid) -> decoder feature
        for lvl in range(len(feats) - 1, 0, -1):
            y = conv(y, 4 * f, f"up{lvl}", kernel=1, act=False)
            y = depth_to_space_n(y, 2)
            y = y + conv(feats[lvl - 1], f, f"lat{lvl}", kernel=1, act=False)
            y = conv(y, f, f"fuse{lvl}",
                     kernel=v.fuse1_kernel if lvl == 1 else 3)
            levels[lvl] = y

        def head(feat, ch, name):
            # linear conv with bias (no BN) — the disp-head idiom of the parity nets
            return conv(feat, ch, name, act=False, bn=False, kernel=v.head_kernel)

        def to_disp(logits):
            return (v.head_scale * nn.sigmoid(logits) + v.head_offset).astype(
                jnp.float32)

        base = levels[1]
        d1 = to_disp(depth_to_space_n(head(base, p * p, "disp1"), p))
        if full_only:
            return [d1]
        d2 = to_disp(depth_to_space_n(head(base, (p // 2) ** 2, "disp2"), p // 2))
        # d3/d4 read the decoder level whose grid already is 1/4 resp. 1/8 of the
        # input: level l has resolution H / (patch * 2**(l-1)).
        lvl3 = {4: 1, 2: 2}[p]
        assert lvl3 + 1 in levels, (
            f"turbo-{v.name}: need >= {lvl3 + 2} encoder stages for the 1/8 head")
        d3 = to_disp(head(levels[lvl3], 1, "disp3"))
        d4 = to_disp(head(levels[lvl3 + 1], 1, "disp4"))
        return [d1, d2, d3, d4]
