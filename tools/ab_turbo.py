"""A/B the turbo serving forwards on the chip: module vs fast_turbo fold policies.

Warmed (non-splat) BN stats — the realistic serving constants; whole-graph
best-of-N timing with a host readback (CLAUDE.md: no subgraph profiles, no
block_until_ready over the tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_turbo.py [variant] [B]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main(variant_name: str = "small", B: int = 128):
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    H, W = 384, 576
    v = TurboVariant.by_name(variant_name)
    model = TurboDepthNet(v, dtype=jnp.bfloat16)
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

    x = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.uint8))

    def bench(fwd, label, n=15, trials=4):
        f = jax.jit(lambda x: jnp.sum(fwd(x.astype(jnp.bfloat16))))
        assert np.isfinite(float(f(x)))
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            for _ in range(n):
                out = f(x)
            float(out)
            best = min(best, (time.time() - t0) / n)
        print(f"{label:>14}: {best*1e3:6.2f} ms/batch  {B/best:7.0f} fps",
              flush=True)
        return best

    print(f"# turbo-{variant_name} {W}x{H} b{B}, warmed stats")
    bench(lambda xx: model.apply(variables, xx, train=False, full_only=True)[0],
          "module")
    for fold in ("none", "base", "all"):
        bench(lambda xx, fold=fold: fast_turbo_forward(variables, xx, v, fold=fold),
              f"fast/{fold}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "small",
         int(sys.argv[2]) if len(sys.argv) > 2 else 128)
