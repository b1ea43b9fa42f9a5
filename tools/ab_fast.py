"""A/B timing of the fast inference path vs the module forward on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_fast.py [B] [combos...]
Combos: baseline, none, deconv, tail, tailov, stem, stemov, best, pallas, pallas0,
hybrid, bestdp (default: baseline stemov tailov best).
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
    which = sys.argv[2:] or ["baseline", "stemov", "tailov", "best"]
    H, W = 384, 576

    model = DispNet(DispNetVariant.depth4(), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    combos = {
        "baseline": None,
        "none": dict(stem="native", deconv="native", tail="native"),
        "deconv": dict(stem="native", deconv="phase", tail="native"),
        "tail": dict(stem="native", deconv="native", tail="phase"),
        "tailov": dict(stem="native", deconv="native", tail="overlap"),
        "stem": dict(stem="phase", deconv="native", tail="native"),
        "stemov": dict(stem="overlap", deconv="native", tail="native"),
        "best": dict(stem="overlap", deconv="native", tail="overlap"),
        "pallas": dict(stem="overlap", deconv="native", tail="pallas"),
        "pallas0": dict(stem="native", deconv="native", tail="pallas"),
        "hybrid": dict(stem="hybrid", deconv="native", tail="overlap"),
        "bestdp": dict(stem="overlap", deconv="phase", tail="overlap"),
        "midov": dict(stem="overlap", deconv="native", mid="overlap", tail="overlap"),
        "midph": dict(stem="overlap", deconv="native", mid="phase", tail="overlap"),
        "midov_tn": dict(stem="overlap", deconv="native", mid="overlap", tail="native"),
        "midph_tph": dict(stem="overlap", deconv="native", mid="phase", tail="phase"),
    }
    for name in which:
        flags = combos[name]
        if flags is None:
            @jax.jit
            def f(x):
                return jnp.sum(model.apply(variables, x, train=False)[0].astype(jnp.float32))
        else:
            @jax.jit
            def f(x, flags=flags):
                return jnp.sum(fast_depth_forward(variables, x, **flags)[0])
        ms = time_fn(f, x) * 1e3
        print(f"{name:12s} {ms:8.2f} ms/batch  {B / ms * 1e3:7.0f} fps", flush=True)


if __name__ == "__main__":
    main()
