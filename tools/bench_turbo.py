"""Measure the turbo architecture track's inference throughput on the chip.

Companion to ``bench.py`` (which stays on the exact-parity depth4 graph — the
honest headline number): this reports what the MXU-shaped TurboDepthNet serves at
the same operating point (576x384, uint8-staged frames, warmed BN stats, bf16).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_turbo.py
       [any TurboVariant.PRESETS name] [--height 384 --width 576]
       [--batches 128,256] — prints one JSON line.  The ``colon`` preset's own
       operating point is ``--height 240 --width 720`` (ref train_depth_only.py:21-25).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("variant", nargs="?", default="base")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=576)
    ap.add_argument("--batches", default="128,256")
    args = ap.parse_args(argv)
    variant_name = args.variant

    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    from tf_depth_estimation_tpu.utils.constants import NORTH_STAR_FPS

    H, W = args.height, args.width
    variant = TurboVariant.by_name(variant_name)
    model = TurboDepthNet(variant, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    x0 = jnp.asarray((rng.rand(8, H, W, 3) * 255).astype(np.uint8)).astype(jnp.float32)
    # jit everything that touches the device — unjitted init/apply dispatch op-by-op
    # through the tunnel's remote compile service (minutes per cold model)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    # warm the BN stats so eval-mode shifts are realistic non-splat constants —
    # init-stats benches dodge the XLA bias-fusion cost a real checkpoint pays
    # (ROADMAP round-3 campaign); jitted: unjitted train-mode apply would dispatch
    # op-by-op through the tunnel's remote compile service (minutes)
    @jax.jit
    def warm(variables, x):
        _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return upd["batch_stats"]

    for _ in range(2):
        variables = {**variables, "batch_stats": warm(variables, x0)}

    from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

    @jax.jit
    def fwd_sum(x):
        # the production TurboPredictor forward (infer/fast_turbo.py, measured
        # serving winner; exact vs the module forward — tests/test_turbo.py)
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
            print(f"# turbo-{variant_name} batch {B} trial {trial}: {fps:.0f} "
                  f"frames/s ({dt/n*1e3:.2f} ms/batch)", file=sys.stderr, flush=True)
            if fps > best:
                best, best_batch = fps, B

    print(json.dumps({
        "metric": f"turbo_{variant_name}_frames_per_sec_per_chip_{W}x{H}_b{best_batch}",
        "value": round(best, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / NORTH_STAR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
