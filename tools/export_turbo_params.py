"""Export serving weights (params + batch_stats) from an orbax checkpoint to .npz.

The on-chip campaign checkpoints (``tools/train_colon_chip.py`` teacher,
``tools/distill_chip.py`` students) are orbax directories carrying Adam state —
3x the parameter bytes and not a format a repo can version.  This strips them to
the serving variables and writes one compressed .npz per checkpoint
(``train/checkpoint.py: save_variables_npz``), loadable by ``TurboPredictor`` /
``DepthPredictor`` via ``load_variables_npz``.

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/export_turbo_params.py \
        --checkpoint_dir /tmp/ckpt_students_576x384/nano --group turbo \
        --out weights/turbo_nano_distilled_576x384.npz --meta variant=nano
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--group", default="turbo", help="'turbo' (students) or 'model'")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--meta", action="append", default=[],
                   help="extra key=value metadata (repeatable)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # restore needs no accelerator

    from tf_depth_estimation_tpu.train.checkpoint import (
        CheckpointManager,
        save_variables_npz,
    )

    for kv in args.meta:
        if "=" not in kv:
            p.error(f"--meta entries must be key=value (got {kv!r})")
    mgr = CheckpointManager(args.checkpoint_dir)
    tree = mgr.restore_group(args.group, step=args.step)
    if "step" in tree:
        step = int(tree["step"])
    else:
        step = int(args.step if args.step is not None else mgr.latest_step())
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    meta = dict(kv.split("=", 1) for kv in args.meta)
    meta.setdefault("step", str(step))
    meta.setdefault("source", os.path.abspath(args.checkpoint_dir))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_variables_npz(args.out, variables, **meta)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(tree["params"]))
    print(json.dumps({"out": args.out, "step": step, "n_params": int(n_params),
                      "bytes": os.path.getsize(args.out), **meta}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
