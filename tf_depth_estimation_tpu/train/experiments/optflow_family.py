"""Small colon-pair experiment family sharing one CLI:

``--mode only_image``   -> ref ``train_onlyimage.py``   (GT-proj photometric only)
``--mode optflow_only`` -> ref ``train_optflow_only.py`` (flow-only training)
``--mode optflow3``     -> ref ``train_optflow.py``      (3-channel-head depth L1)
``--mode pre``          -> ref ``train_pre.py``          (plain L1 + smooth)
``--mode sfm``          -> ref ``train.py``              (SfMLearner multi-source)
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
from tf_depth_estimation_tpu.train.steps import (
    jit_step,
    make_depth_only_step,
    make_sfm_multi_step,
    make_only_image_step,
    make_optflow3_step,
    make_optflow_only_step,
)

_MODES = {
    # mode: (weights factory, variant, input channels, step factory)
    "only_image": (LossWeights.only_image, DispNetVariant.depth4, 6, make_only_image_step),
    "optflow_only": (LossWeights.optflow_only, DispNetVariant.sfm, 3, make_optflow_only_step),
    "optflow3": (LossWeights.optflow3, DispNetVariant.sfm, 6, make_optflow3_step),
    "pre": (LossWeights.depth_only, DispNetVariant.depth4, 3, make_depth_only_step),
    "sfm": (LossWeights.sfm_multi, DispNetVariant.sfm, 3, make_sfm_multi_step),
}


def main(argv=None):
    p = base_parser(__doc__, batch_size=10, max_steps=20000)
    p.add_argument("--mode", choices=sorted(_MODES), required=True)
    p.add_argument("--image_height", type=int, default=240)
    p.add_argument("--image_width", type=int, default=720)
    p.add_argument("--resized_height", type=int, default=224)
    p.add_argument("--resized_width", type=int, default=480)
    args = p.parse_args(argv)

    weights_factory, variant_factory, in_ch, step_factory = _MODES[args.mode]
    H, W = args.resized_height, args.resized_width
    w = dataclasses.replace(weights_factory(), height=H, width=W,
                            max_steps=args.max_steps)
    ds = PairDepthDataset(args.dataset_dir, split="train",
                          image_height=args.image_height, image_width=args.image_width,
                          resized_height=H, resized_width=W)
    batches = pair_loader(args, ds, args.batch_size)
    model = DispNet(variant_factory(), dtype=compute_dtype(args))
    state = create_train_state(model, jnp.zeros((args.batch_size, H, W, in_ch)),
                               learning_rate=args.learning_rate, beta1=args.beta1)
    mgr, logger, state = setup_run(args, state)
    state, last = run_training(
        state=state, train_step=jit_step(step_factory(w)), batches=batches,
        max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
