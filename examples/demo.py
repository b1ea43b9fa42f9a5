"""Qualitative single-image depth demo — replaces ``demo.ipynb``.

Loads (or initializes) a DispNet checkpoint, predicts disparity for the given frames, and
writes side-by-side image/depth visualization PNGs.

    python examples/demo.py --frames 'data/*.jpg' --checkpoint_dir ./ck --out demo_out
"""
from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", required=True, help="glob of input JPEGs")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.predictor import DepthPredictor, _load_frame
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.utils.viz import normalize_depth_for_display

    model = DispNet(DispNetVariant.depth4())
    state = create_train_state(model, jnp.zeros((1, args.height, args.width, 3)))
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
        from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state

        mgr = CheckpointManager(args.checkpoint_dir)
        if mgr.latest_step() is not None:
            state = load_into_state(
                state, mgr.restore_group("model", like=_save_tree(state))
            )

    pred = DepthPredictor(state.params, state.batch_stats, height=args.height,
                          width=args.width, batch_size=8, dtype=jnp.float32)
    paths = sorted(glob(args.frames))
    frames = np.stack([_load_frame(f, args.height, args.width) for f in paths])
    disps = pred.predict_array(frames)

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path, frame, disp in zip(paths, frames, disps):
        depth_vis = normalize_depth_for_display(1.0 / (disp + 1e-6), cmap="plasma")
        fig, axes = plt.subplots(1, 2, figsize=(8, 3))
        axes[0].imshow(frame.astype(np.uint8)); axes[0].set_title("input"); axes[0].axis("off")
        axes[1].imshow(depth_vis); axes[1].set_title("disparity"); axes[1].axis("off")
        out = os.path.join(args.out, os.path.basename(path) + ".png")
        fig.savefig(out, bbox_inches="tight", dpi=100)
        plt.close(fig)
        print("wrote", out)


if __name__ == "__main__":
    main()
