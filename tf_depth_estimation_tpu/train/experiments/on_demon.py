"""DeMoN-stream depth training — BASELINE config 5 (ref ``train_depth_only_onDemon.py``).

DepthPoseNet (truncated) on the DeMoN pair; smoothness-on-inverse-depth objective (the
reference's faithful quirk: total = smooth only; pass ``--optimize_depth`` to add the L1
term, the script's evident intent).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DepthPoseNet
from tf_depth_estimation_tpu.train.experiments.common import (
    base_parser,
    compute_dtype,
    demon_loader,
    setup_run,
)
from tf_depth_estimation_tpu.train.loop import run_training
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_on_demon_step


def main(argv=None):
    p = base_parser(__doc__, batch_size=16, max_steps=200000, save_latest_freq=100)
    p.add_argument("--image_height", type=int, default=192)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--optimize_depth", action="store_true",
                   help="also optimize the L1 depth term (ref computes but drops it)")
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    w = dataclasses.replace(LossWeights.on_demon(), height=H, width=W,
                            max_steps=args.max_steps)
    batches = demon_loader(args, H, W)
    model = DepthPoseNet(full_resolution=False, dtype=compute_dtype(args))
    state = create_train_state(model, jnp.zeros((args.batch_size, H, W, 6)),
                               learning_rate=args.learning_rate, beta1=args.beta1)
    mgr, logger, state = setup_run(args, state)
    state, last = run_training(
        state=state,
        train_step=jit_step(make_on_demon_step(w, smooth_only=not args.optimize_depth)),
        batches=batches, max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
