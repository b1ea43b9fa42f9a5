"""Probe 2: int8 vs bf16 MXU rate at MXU-saturating shapes.

Probe 1 (`probe_int8_dot.py`, fori_loop-of-dots in one VMEM block) topped out at
~40 TFLOP/s for every variant — the loop+accumulate doesn't pipeline the MXU, so it
cannot distinguish the int8 path. This probe uses shapes XLA is known to saturate on:
a single 4096^3 matmul (137 GFLOP) timed by pipelined enqueue + final readback, and a
classic grid-tiled Pallas matmul (bm=bn=512, full-K dot per step).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_dot2.py
"""
from __future__ import annotations

import time

import numpy as np

M = K = N = 4096
BM = BN = 512


def time_2arg(jf, a, b, n=8, trials=5):
    s = float(jf(a, b))
    assert np.isfinite(s), "non-finite output"
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = jf(a, b)
        _ = float(out)
        best = min(best, (time.time() - t0) / n)
    return best


def make_xla_single(acc_dtype):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(a, b):
        out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_dtype)
        return jnp.sum(out.astype(jnp.float32))

    return f


def make_pallas_grid(acc_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

    @jax.jit
    def f(a, b):
        out = pl.pallas_call(
            kern,
            grid=(M // BM, N // BN),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            in_specs=[pl.BlockSpec((BM, K), lambda i, j: (i, 0)),
                      pl.BlockSpec((K, BN), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)
        return jnp.sum(out.astype(jnp.float32))

    return f


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N), dtype=np.int8))
    abf = jnp.asarray(rng.rand(M, K).astype(np.float32), jnp.bfloat16)
    bbf = jnp.asarray(rng.rand(K, N).astype(np.float32), jnp.bfloat16)

    gflop = 2.0 * M * K * N / 1e9
    results = {}
    cases = [
        ("xla_single_bf16", make_xla_single(jnp.float32), abf, bbf),
        ("xla_single_int8", make_xla_single(jnp.int32), a8, b8),
        ("pallas_grid_bf16", make_pallas_grid(jnp.float32), abf, bbf),
        ("pallas_grid_int8", make_pallas_grid(jnp.int32), a8, b8),
    ]
    for name, f, a, b in cases:
        try:
            dt = time_2arg(f, a, b)
            results[name] = dt
            print(f"{name:17s}: {dt*1e3:8.3f} ms  {gflop/dt/1e3:8.1f} T(FL)OP/s")
        except Exception as e:
            print(f"{name:17s}: FAILED: {type(e).__name__}: {str(e)[:300]}")

    for fam in ("xla_single", "pallas_grid"):
        kb, ki = f"{fam}_bf16", f"{fam}_int8"
        if kb in results and ki in results:
            r = results[kb] / results[ki]
            print(f"{fam}: int8 speedup vs bf16 = {r:.2f}x"
                  + ("  <-- DOUBLE-RATE PATH" if r >= 1.5 else ""))


if __name__ == "__main__":
    main()
