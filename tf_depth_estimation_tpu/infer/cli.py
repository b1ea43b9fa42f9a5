"""Batch-prediction CLI — equivalent of ``batch_prediction.py`` / ``batch_prediction_cam_est.py``.

``python -m tf_depth_estimation_tpu.infer.cli --dataset_dir D --output_dir O
--checkpoint_dir C [--mode depth|pair]``: restores the latest checkpoint, globs ``*.jpg``,
writes ``<name>_z.bin`` float32 depth dumps (and ``<frame>.txt`` poses in pair mode).
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from tf_depth_estimation_tpu.infer.predictor import DepthPredictor, PairPredictor
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
from tf_depth_estimation_tpu.train.state import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint_dir", default="",
                   help="orbax checkpoint directory (this or --weights)")
    p.add_argument("--weights", default="",
                   help="flat .npz serving weights (tools/export_turbo_params.py; "
                        "the committed weights/*.npz students load this way). "
                        "If its metadata names a variant, it overrides "
                        "--turbo_variant.")
    p.add_argument("--checkpoint_group", default=None,
                   help="orbax group (default: 'model'; 'turbo' in turbo mode — "
                        "pass 'model' explicitly for a depth_only --turbo run)")
    p.add_argument("--mode", choices=["depth", "pair", "turbo"], default="depth",
                   help="'turbo' serves a TurboDepthNet student (models/turbo.py); "
                        "combine with --turbo_variant")
    p.add_argument("--turbo_variant", default="base")
    p.add_argument("--image_height", type=int, default=224,
                   help="network input height (ref batch_prediction.py: 224)")
    p.add_argument("--image_width", type=int, default=224)
    p.add_argument("--out_height", type=int, default=240,
                   help="output .bin resolution (ref: 240x720)")
    p.add_argument("--out_width", type=int, default=720)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--no_bilateral", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    H, W = args.image_height, args.image_width
    if bool(args.checkpoint_dir) == bool(args.weights):
        p.error("pass exactly one of --checkpoint_dir / --weights")

    npz_meta = {}
    if args.weights:
        from tf_depth_estimation_tpu.train.checkpoint import load_variables_npz

        npz_vars, npz_meta = load_variables_npz(args.weights)
        if args.mode == "turbo" and npz_meta.get("variant"):
            args.turbo_variant = npz_meta["variant"]

    if args.mode == "depth":
        model = DispNet(DispNetVariant.depth4(), dtype=dtype)
        ex = jnp.zeros((1, H, W, 3))
    elif args.mode == "turbo":
        from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

        turbo_variant = TurboVariant.by_name(args.turbo_variant)
        model = TurboDepthNet(turbo_variant, dtype=dtype)
        ex = jnp.zeros((1, H, W, 3))
    else:
        model = DepthPoseNet(full_resolution=False, dtype=dtype)
        ex = jnp.zeros((1, H, W, 6))
    if args.weights:
        params, batch_stats = npz_vars["params"], npz_vars["batch_stats"]
        # Validate the loaded tree against this model's init shapes NOW, so a
        # variant-mismatched .npz fails with the file name and expected variant
        # instead of an opaque shape error inside the jitted forward.
        import jax

        ref = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), ex, train=False))
        got = jax.tree_util.tree_map(lambda a: jnp.shape(a), params)
        want = jax.tree_util.tree_map(lambda s: s.shape, ref["params"])
        if got != want:
            detail = (f"variant {args.turbo_variant!r}" if args.mode == "turbo"
                      else f"mode {args.mode!r}")
            raise SystemExit(
                f"{args.weights} does not match {detail}: parameter tree "
                f"shapes differ from the model's init shapes. If this is a "
                f"turbo .npz without 'variant' metadata, pass the matching "
                f"--turbo_variant explicitly.")
    else:
        state = create_train_state(model, ex)
        if args.checkpoint_group is None:
            args.checkpoint_group = "turbo" if args.mode == "turbo" else "model"
        mgr = CheckpointManager(args.checkpoint_dir)
        from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state

        tree = mgr.restore_group(args.checkpoint_group, like=_save_tree(state))
        state = load_into_state(state, tree)
        params, batch_stats = state.params, state.batch_stats

    if args.mode == "turbo":
        from tf_depth_estimation_tpu.infer.predictor import TurboPredictor

        pred = TurboPredictor(params, batch_stats, variant=turbo_variant,
                              height=H, width=W, batch_size=args.batch_size,
                              dtype=dtype)
    else:
        cls = DepthPredictor if args.mode == "depth" else PairPredictor
        pred = cls(params, batch_stats, height=H, width=W,
                   batch_size=args.batch_size, dtype=dtype)
    written = pred.predict_directory(
        args.dataset_dir, args.output_dir, out_height=args.out_height,
        out_width=args.out_width, bilateral=not args.no_bilateral,
    )
    print(f"wrote {len(written)} depth maps to {args.output_dir}")
    return written


if __name__ == "__main__":
    main()
