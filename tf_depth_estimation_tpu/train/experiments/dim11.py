"""Joint depth+pose on 224x224 colon pairs — ref ``train_depth_only_dim11.py``.

DepthPoseNet (full-resolution) on the dim11 loader's [-0.5, 0.5] pairs; depth L1 +
smoothness + exp-weighted photometric with the predicted euler pose.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.data import BatchLoader, Dim11Dataset, device_prefetch
from tf_depth_estimation_tpu.geometry import make_intrinsics_matrix, scale_intrinsics_pyramid
from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DepthPoseNet
from tf_depth_estimation_tpu.train.experiments.common import base_parser, compute_dtype, setup_run
from tf_depth_estimation_tpu.train.loop import run_training
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_dim11_step


def main(argv=None):
    p = base_parser(__doc__, batch_size=10, max_steps=200000)
    p.add_argument("--image_height", type=int, default=224)
    p.add_argument("--image_width", type=int, default=224)
    p.add_argument("--depth_dir", default=None)
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    w = dataclasses.replace(LossWeights.dim11(), height=H, width=W,
                            max_steps=args.max_steps)
    ds = Dim11Dataset(args.dataset_dir, split="train", image_height=H, image_width=W,
                      resized_height=H, resized_width=W, depth_dir=args.depth_dir)

    def with_intrinsics(batches):
        """dim11 cam files hold 6 raw values (fx fy cx cy + 2 unused); build the pyramid."""
        for b in batches:
            cam = b.pop("cam")
            K = make_intrinsics_matrix(cam[:, 0], cam[:, 1], cam[:, 2], cam[:, 3])
            b["intrinsics"] = np.asarray(scale_intrinsics_pyramid(jnp.asarray(K), 4))
            yield b

    batches = device_prefetch(
        with_intrinsics(iter(BatchLoader(ds, args.batch_size, seed=args.seed,
                                         num_epochs=args.num_epochs)))
    )
    model = DepthPoseNet(full_resolution=True, dtype=compute_dtype(args))
    state = create_train_state(model, jnp.zeros((args.batch_size, H, W, 6)),
                               learning_rate=args.learning_rate, beta1=args.beta1)
    mgr, logger, state = setup_run(args, state)
    state, last = run_training(
        state=state, train_step=jit_step(make_dim11_step(w)), batches=batches,
        max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
