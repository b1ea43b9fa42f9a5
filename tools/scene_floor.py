"""Information floor of a synthetic scene family: the best abs-rel any
image-INDEPENDENT predictor can reach (per-pixel median of the depth
distribution over scenes).

Why it matters (VERDICT r4 weak #4 / item 6): in the 'v1' family the image is
statistically independent of the depth's bump field, so this floor binds EVERY
depth-from-image model — teacher quality cannot improve past it, which is the
closing statement of the teacher-generalization thread (gen-1 0.0718 -> gen-2
0.0687 -> gen-3 0.0661 vs a ~0.064 floor).  In the 'rich' family the 1/d^2
illumination couples image to depth, so models CAN beat this number — the gap
between a trained model and this floor measures how much of the image cue it
exploits.

Usage::

    python tools/scene_floor.py [--families v1,rich] [--n 3000] [--hw 96x144]

Prints one JSON row per family (fit field + held-out floor).
"""
from __future__ import annotations

import argparse
import json


def floor_row(family: str, n: int, H: int, W: int, seed: int = 0):
    import numpy as np

    from tf_depth_estimation_tpu.data.synthetic import make_pair_scene

    rng = np.random.RandomState(seed)
    ds = np.stack([make_pair_scene(rng, H, W, family=family)[2]
                   for _ in range(n)])
    half = n // 2
    med = np.median(ds[:half], axis=0)

    def absrel(d):
        return float(np.mean(np.abs(d - med) / np.maximum(d, 1e-3)))

    return {
        "metric": f"scene_floor_{family}_{W}x{H}",
        "family": family,
        "n_scenes": n,
        "absrel_floor_fit": round(absrel(ds[:half]), 5),
        "absrel_floor_heldout": round(absrel(ds[half:]), 5),
        "binding": family == "v1",
        "note": ("binds ALL models (image independent of depth)" if family == "v1"
                 else "binds only image-independent predictors (depth is in the "
                      "image via 1/d^2 illumination)"),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--families", default="v1,rich")
    p.add_argument("--n", type=int, default=3000)
    p.add_argument("--hw", default="96x144")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    H, W = (int(v) for v in args.hw.split("x"))
    rows = []
    for fam in args.families.split(","):
        row = floor_row(fam.strip(), args.n, H, W)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
            f.write("\n")
    return rows


if __name__ == "__main__":
    main()
