"""Cumulative stage costs of the production fast inference path on the real TPU.

Times ``fast_depth_forward`` truncated at successive stages (XLA dead-code-eliminates
everything after the returned tensors), so stage cost = delta between consecutive rows.
More reliable than isolated-layer timing over the axon tunnel (see
tools/profile_ablation.py notes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fast.py [B]
"""
from __future__ import annotations

import sys
import time

import numpy as np


try:
    from tools._bench import time_fn
except ImportError:  # run as `python tools/x.py`
    from _bench import time_fn


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.fast import fast_depth_forward
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stem = sys.argv[2] if len(sys.argv) > 2 else "overlap"
    H, W = 384, 576
    model = DispNet(DispNetVariant.depth4(), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    prev = 0.0
    for stage in ("cnv1", "cnv1b", "cnv2", "stem", "encoder", "d3", "d2", ""):
        @jax.jit
        def f(x, stage=stage):
            outs = fast_depth_forward(variables, x, stem=stem, stop_at=stage)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        ms = time_fn(f, x) * 1e3
        label = stage or "full"
        print(f"{label:8s} {ms:8.2f} ms/batch   stage-delta {ms - prev:+7.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
