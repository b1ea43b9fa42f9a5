"""Shared best-of-N timing helper for the TPU tools.

The axon runtime dispatches fully async and ``block_until_ready`` does not block
over the tunnel, so every window ends with a host readback of the last output
(CLAUDE.md timing discipline); the tunnel's load variance is handled by taking the
best of several windows.
"""
from __future__ import annotations

import time

import numpy as np


def time_fn(jf, x, n=12, trials=4):
    """Best-of-``trials`` mean seconds per call of ``jf(x)`` over ``n``-call windows."""
    s = float(jf(x))
    assert np.isfinite(s), "non-finite output"
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = jf(x)
        _ = float(out)                 # host readback forces completion
        best = min(best, (time.time() - t0) / n)
    return best
