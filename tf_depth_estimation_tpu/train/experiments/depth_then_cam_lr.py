"""Full symmetric L/R training — ref ``train_depth_then_cam_lr.py``.

LRNet (shared-weight single disp net per view + pairwise DepthPoseNet both stack orders)
on the DeMoN stream; photometric (exp-weighted, predicted poses) + smooth(1/d) on all
four depth pyramids + full-4x4 pose MSE at scale 0 + L/R inverse-depth consistency +
guarded depth L1 on the single net.  ``--gt_pose`` switches to the
``train_depth_then_cam_lr_gtdepth_gtcam.py`` variant (pair nets only, GT-pose warps,
un-ramped 5-delta sig loss, asymmetric rot/trans cam loss).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import LRNet
from tf_depth_estimation_tpu.train.experiments.common import (
    base_parser,
    compute_dtype,
    demon_loader,
    setup_run,
)
from tf_depth_estimation_tpu.train.loop import run_training
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_lr_full_step, make_lr_gt_step


def main(argv=None):
    p = base_parser(__doc__, batch_size=16, max_steps=200000)
    p.add_argument("--image_height", type=int, default=192)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--gt_pose", action="store_true",
                   help="gtdepth_gtcam variant (GT-pose warps, sig loss)")
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    base = LossWeights.gtdepth_gtcam() if args.gt_pose else LossWeights.depth_then_cam_lr()
    w = dataclasses.replace(base, height=H, width=W, max_steps=args.max_steps)
    batches = demon_loader(args, H, W)
    model = LRNet(with_single=not args.gt_pose, dtype=compute_dtype(args))
    l = jnp.zeros((args.batch_size, H, W, 3))
    state = create_train_state(model, (l, l), learning_rate=args.learning_rate,
                               beta1=args.beta1)
    mgr, logger, state = setup_run(args, state)
    step = make_lr_gt_step(w) if args.gt_pose else make_lr_full_step(w)
    state, last = run_training(
        state=state, train_step=jit_step(step), batches=batches,
        max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
