"""Joint depth + optical flow — BASELINE config 4 (ref ``train_optflow_combine.py``).

8-output DispNet (depth + flow decoders, ``nets_depth.py`` — the net the script's
8-output indexing intends, SURVEY §2.6 drift note) on 224x480 colon pairs; depth L1 +
smoothness (depth + both flow channels) + wmask-weighted photometric (depth-warp and
flow-warp) + flow-from-GT-depth supervision.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tf_depth_estimation_tpu.data import PairDepthDataset
from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
from tf_depth_estimation_tpu.train.experiments.common import base_parser, compute_dtype, pair_loader, setup_run
from tf_depth_estimation_tpu.train.loop import run_training
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_optflow_combine_step


def main(argv=None):
    p = base_parser(__doc__, batch_size=10, max_steps=20000)
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=720)
    p.add_argument("--resized_height", type=int, default=224)
    p.add_argument("--resized_width", type=int, default=480)
    args = p.parse_args(argv)

    H, W = args.resized_height, args.resized_width
    w = dataclasses.replace(LossWeights.optflow_combine(), height=H, width=W,
                            max_steps=args.max_steps)
    ds = PairDepthDataset(args.dataset_dir, split="train",
                          image_height=args.image_height, image_width=args.image_width,
                          resized_height=H, resized_width=W)
    batches = pair_loader(args, ds, args.batch_size)
    model = DispNet(DispNetVariant.depth10_flow(), dtype=compute_dtype(args))
    state = create_train_state(model, jnp.zeros((args.batch_size, H, W, 3)),
                               learning_rate=args.learning_rate, beta1=args.beta1)
    mgr, logger, state = setup_run(args, state)
    summary_fn = None
    if args.rich_summaries:
        from tf_depth_estimation_tpu.train.summaries import make_depth_summary_fn

        summary_fn = make_depth_summary_fn(w)
    state, last = run_training(
        state=state, train_step=jit_step(make_optflow_combine_step(w)), batches=batches,
        max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
        image_summary_fn=summary_fn, image_summary_freq=args.image_summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
