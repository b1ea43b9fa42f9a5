"""Systematic XLA:TPU compiler-option sweep on the bench graph (ROADMAP round-3 #1).

Round 2 verified the mechanism (``jax.jit(f, compiler_options=...)`` forwards
proto-backed ``xla_tpu_*`` flags through the axon compile service) but probed exactly
one flag. This sweeps the layout / fusion / scoped-memory knobs on the production
inference graph (``fast_depth_forward`` @576x384 b128) best-of-N, per the
whole-graph-only timing discipline (CLAUDE.md).

Unknown/rejected flags are recorded as INVALID (the service errors on unknown names) —
that is itself sweep output. Results print as a markdown table for ROADMAP.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_flags.py [B] [first:last]
"""
from __future__ import annotations

import sys
import time

import numpy as np


# (label, options dict). Each entry compiles the full bench graph once.
FLAG_SETS = [
    ("baseline", {}),
    # scoped VMEM budget for fusions: more VMEM lets bigger fusions materialize
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # dot/conv strength reduction + fusion shape knobs
    ("no_dot_strength_red", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("multi_level_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("no_multi_level_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("aggressive_layout_opt",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("no_aggressive_layout_opt",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "false"}),
    ("bundle_aware_cost_model",
     {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("experimental_fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    # vector load/store fusion limits (elementwise chains around the convs)
    ("vector_fusion_wide", {"xla_tpu_vector_load_fusion_limit": "1024",
                            "xla_tpu_vector_store_fusion_limit": "1024"}),
    # loop-invariant code motion inflation
    ("licm_inflate_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    # latency-hiding scheduler (round-2 probe: no effect; keep for the table)
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # memory-bound loop optimizer
    ("mblo_off", {"xla_tpu_enable_sparse_core_collective_offload_all_reduce": "false",
                  "xla_tpu_memory_bound_loop_optimizer_options": "enabled:false"}),
    # DMA / transfer chunking
    ("nd_short_transfer_8k", {"xla_tpu_nd_short_transfer_max_chunks": "8192"}),
    ("nd_short_transfer_256", {"xla_tpu_nd_short_transfer_max_chunks": "256"}),
    # async scheduling aggressiveness
    ("aggressive_async", {"xla_tpu_aggressive_opt_barrier_removal": "true"}),
    # combined winners slot (edit after first pass)
]


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.fast import fast_depth_forward
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sel = slice(None)
    if len(sys.argv) > 2:
        a, b = sys.argv[2].split(":")
        sel = slice(int(a) if a else None, int(b) if b else None)
    H, W = 384, 576

    model = DispNet(DispNetVariant.depth4(), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    def fwd(xx):
        return jnp.sum(fast_depth_forward(variables, xx)[0])

    results = []
    for label, opts in FLAG_SETS[sel]:
        jf = jax.jit(fwd, compiler_options=opts or None)
        try:
            t_c0 = time.time()
            s = float(jf(x))  # compile + warm (retry once on flaky HTTP 500)
        except Exception as e:
            msg = str(e)
            if "500" in msg or "UNAVAILABLE" in msg or "DEADLINE" in msg:
                try:
                    s = float(jf(x))
                except Exception as e2:
                    print(f"| {label} | ERROR | {str(e2)[:120]} |", flush=True)
                    continue
            else:
                print(f"| {label} | INVALID | {msg[:160]} |", flush=True)
                continue
        compile_s = time.time() - t_c0
        assert np.isfinite(s), label
        n, best = 10, 1e30
        for _ in range(4):
            t0 = time.time()
            for _ in range(n):
                out = jf(x)
            _ = float(out)
            best = min(best, (time.time() - t0) / n)
        fps = B / best
        results.append((label, best, fps))
        print(f"| {label} | {best*1e3:.1f} ms | {fps:.0f} fps | compile {compile_s:.0f}s |",
              flush=True)

    if results:
        results.sort(key=lambda r: r[1])
        print("\n# ranked:")
        for label, ms, fps in results:
            print(f"#   {label:32s} {ms*1e3:6.1f} ms  {fps:7.0f} fps")


if __name__ == "__main__":
    main()
