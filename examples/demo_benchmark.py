"""Coarse->refined cascade demo — replaces ``demo_benchmark.ipynb``.

Mirrors the notebook's inference chain (and ``split_training.py``'s phase-2 input
assembly): the pairwise DepthPoseNet produces a coarse depth from an image pair, which is
nearest-upsampled, concatenated with the image, and refined by the single DispNet.  Writes
a 3-panel PNG (input / coarse / refined) per pair and prints the predicted pose.

    python examples/demo_benchmark.py --left a.png --right b.png \
        --pair_checkpoint ./ck_pair --single_checkpoint ./ck_single
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--left", required=True)
    p.add_argument("--right", required=True)
    p.add_argument("--pair_checkpoint", default=None)
    p.add_argument("--single_checkpoint", default=None)
    p.add_argument("--out", default="demo_benchmark_out")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.predictor import _load_frame
    from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
    from tf_depth_estimation_tpu.ops.resize import resize_nearest
    from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
    from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.utils.viz import normalize_depth_for_display

    H, W = args.height, args.width
    pair_model = DepthPoseNet(full_resolution=False)
    pair_state = create_train_state(pair_model, jnp.zeros((1, H, W, 6)))
    single_model = DispNet(DispNetVariant.depth4())
    single_state = create_train_state(single_model, jnp.zeros((1, H, W, 4)))

    def try_restore(state, directory, group):
        if directory and os.path.isdir(directory):
            mgr = CheckpointManager(directory)
            if mgr.latest_step() is not None:
                return load_into_state(
                    state, mgr.restore_group(group, like=_save_tree(state))
                )
        return state

    pair_state = try_restore(pair_state, args.pair_checkpoint, "model_pairdepth")
    single_state = try_restore(single_state, args.single_checkpoint, "model_singledepth")

    left = _load_frame(args.left, H, W)[None]
    right = _load_frame(args.right, H, W)[None]
    pair = jnp.concatenate([jnp.asarray(left), jnp.asarray(right)], axis=-1)

    pv = {"params": pair_state.params}
    if pair_state.batch_stats:
        pv["batch_stats"] = pair_state.batch_stats
    disps, pose, _masks = jax.jit(
        lambda x: pair_model.apply(pv, x, train=False)
    )(pair)
    coarse = resize_nearest(disps[0], (H, W))
    print("predicted pose (tx ty tz | rotvec):", np.asarray(pose[0, 0]))

    sv = {"params": single_state.params}
    if single_state.batch_stats:
        sv["batch_stats"] = single_state.batch_stats
    refined = jax.jit(
        lambda x: single_model.apply(sv, x, train=False)[0]
    )(jnp.concatenate([coarse, jnp.asarray(left)], axis=-1))

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z_coarse = 1.0 / (np.asarray(coarse[0, :, :, 0]) + 1e-6)
    z_refined = 1.0 / (np.asarray(refined[0, :, :, 0]) + 1e-6)
    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    axes[0].imshow(left[0].astype(np.uint8)); axes[0].set_title("input"); axes[0].axis("off")
    axes[1].imshow(normalize_depth_for_display(z_coarse, cmap="plasma"))
    axes[1].set_title("coarse (pair net)"); axes[1].axis("off")
    axes[2].imshow(normalize_depth_for_display(z_refined, cmap="plasma"))
    axes[2].set_title("refined (single net)"); axes[2].axis("off")
    out = os.path.join(args.out, "cascade.png")
    fig.savefig(out, bbox_inches="tight", dpi=100)
    plt.close(fig)
    print("wrote", out)


if __name__ == "__main__":
    main()
