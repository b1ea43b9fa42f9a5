"""Probe: does TurboDepthNet pay the warmed-stats BN epilogue tax?

The parity graph lost 30% when BN running stats became realistic non-splat
constants (ROADMAP round-3 campaign: XLA:TPU stops fusing the epilogue add for
the *stem* convs specifically).  Turbo's convs all live at the 1/4-grid or
deeper with >=432-wide contractions — this measures whether the same tax
applies there, i.e. whether a bias-in-conv fold like ``infer/fast.py``'s is
worth building for the turbo serving path.

Whole-graph timing only (CLAUDE.md: no subgraph profiles on the tunnel TPU),
best-of-N windows, host readback to close the async gap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_turbo_bn.py [variant]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def time_fwd(model, variables, x, n=15, trials=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd_sum(x):
        out = model.apply(variables, x.astype(jnp.bfloat16), train=False,
                          full_only=True)
        return jnp.sum(out[0])

    assert np.isfinite(float(fwd_sum(x)))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = fwd_sum(x)
        float(out)
        best = min(best, (time.time() - t0) / n)
    return best


def main(variant_name: str = "small"):
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    H, W, B = 384, 576, 128
    model = TurboDepthNet(TurboVariant.by_name(variant_name), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray((rng.rand(8, H, W, 3) * 255).astype(np.uint8)).astype(jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    @jax.jit
    def warm(variables, x):
        _, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return upd["batch_stats"]

    warmed = dict(variables)
    for _ in range(2):
        warmed = {**warmed, "batch_stats": warm(warmed, x0)}

    x = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8))
    t_init = time_fwd(model, variables, x)
    t_warm = time_fwd(model, warmed, x)
    print(f"turbo-{variant_name} b{B} {W}x{H}: init-stats {t_init*1e3:.2f} ms/batch "
          f"({B/t_init:.0f} fps) | warmed-stats {t_warm*1e3:.2f} ms/batch "
          f"({B/t_warm:.0f} fps) | warm/init {t_warm/t_init:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "small")
