"""Probe a CUSTOM turbo configuration's serving throughput (no preset needed).

``tools/bench_turbo.py`` measures the shipped presets; this probes arbitrary
knob combinations (width ladder, FPN width, kernels) to find the next ladder
point before promoting it to a preset.  Same harness as bench_turbo: bf16
``fast_turbo_forward``, warmed BN stats, uint8-staged inputs, best-of-4
15-call windows (CLAUDE.md: tunnel variance).

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_turbo_custom.py \
        --base femto --fpn_width 64 --label atto
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default="femto", help="preset to start from")
    ap.add_argument("--label", default="custom")
    ap.add_argument("--widths", default="", help="comma ints, e.g. 48,96,192,192")
    ap.add_argument("--fpn_width", type=int, default=0)
    ap.add_argument("--head_kernel", type=int, default=0)
    ap.add_argument("--stem_convs", type=int, default=0)
    ap.add_argument("--enc_convs", type=int, default=0)
    ap.add_argument("--fuse1_kernel", type=int, default=0)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=576)
    ap.add_argument("--batches", default="128,256")
    args = ap.parse_args(argv)

    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant
    from tf_depth_estimation_tpu.utils.constants import NORTH_STAR_FPS

    overrides = {"name": args.label}
    if args.widths:
        overrides["widths"] = tuple(int(w) for w in args.widths.split(","))
    for k in ("fpn_width", "head_kernel", "stem_convs", "enc_convs",
              "fuse1_kernel"):
        if getattr(args, k):
            overrides[k] = getattr(args, k)
    variant = dataclasses.replace(TurboVariant.by_name(args.base), **overrides)
    print(f"# probing {variant}", file=sys.stderr, flush=True)

    H, W = args.height, args.width
    model = TurboDepthNet(variant, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray((rng.rand(8, H, W, 3) * 255).astype(np.uint8)).astype(jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    @jax.jit
    def warm(variables, x):
        _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return upd["batch_stats"]

    for _ in range(2):
        variables = {**variables, "batch_stats": warm(variables, x0)}

    @jax.jit
    def fwd_sum(x):
        out = fast_turbo_forward(variables, x.astype(jnp.bfloat16), variant)
        return jnp.sum(out)

    best, best_batch = 0.0, 0
    for B in (int(b) for b in args.batches.split(",")):
        x = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8))
        s = float(fwd_sum(x))  # compile + warm
        assert np.isfinite(s)
        n = 15
        for trial in range(4):
            t0 = time.time()
            for _ in range(n):
                out = fwd_sum(x)
            s = float(out)
            dt = time.time() - t0
            fps = B * n / dt
            print(f"# turbo-{args.label} batch {B} trial {trial}: {fps:.0f} "
                  f"frames/s ({dt/n*1e3:.2f} ms/batch)", file=sys.stderr, flush=True)
            if fps > best:
                best, best_batch = fps, B

    print(json.dumps({
        "metric": f"turbo_{args.label}_frames_per_sec_per_chip_{W}x{H}_b{best_batch}",
        "value": round(best, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / NORTH_STAR_FPS, 4),
        "overrides": {k: v for k, v in overrides.items() if k != "name"},
        "base": args.base,
    }))


if __name__ == "__main__":
    main()
