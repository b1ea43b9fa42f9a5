"""Shared benchmark constants.

The driver-set inference target (BASELINE.json "north_star": ">=10k depth
frames/sec/chip at 576x384 on v5e"; BASELINE.md) — one definition so ``bench.py``
and ``tools/bench_turbo.py`` report vs_baseline against the same number.
"""

NORTH_STAR_FPS = 10000.0
