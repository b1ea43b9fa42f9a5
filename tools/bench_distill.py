"""Per-round distill-quality regression artifact (VERDICT r3 next-round item 6).

The turbo speed ladder's capacity claims lived in ROADMAP prose; this gives them
the same treatment train throughput got (``bench_train.py`` + ``--baseline``):

  * runs the standard capacity probe (``tools/distill_quality.py``: CPU, 64x96,
    400 steps, warmed-random teacher, mirror/rot180 aug) for every shipped preset,
  * optionally merges the on-chip trained-teacher frontier rows produced by
    ``tools/distill_chip.py --out`` (the serving-resolution accuracy numbers) and
    the fps ladder from a ``BENCH_turbo_r*.json`` artifact,
  * writes one ``DISTILL_r*.json`` and regression-checks the capacity probes
    against a previous round's artifact (exit 1 on a >``--tolerance`` MAE rise).

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_distill.py \
        --out DISTILL_r04.json [--chip_rows DISTILL_chip.json] \
        [--fps BENCH_turbo_r04.json] [--baseline DISTILL_r03.json]
"""
from __future__ import annotations

import argparse
import json
import sys

PRESETS = ("base", "small", "sprint", "nano", "pico")


def compare_to_baseline(probes, baseline_probes, tolerance=0.15):
    """Capacity regressions: holdout MAE rising >tolerance vs the previous round.

    Lists of distill_quality result dicts keyed by ``metric``.  A preset missing
    from the current run is itself a regression (a ladder point was dropped).
    """
    got = {r["metric"]: r for r in probes}
    failures = []
    for b in baseline_probes:
        m = b["metric"]
        if m not in got:
            failures.append(f"{m}: missing from current run")
            continue
        v0, v1 = float(b["holdout_mae_vs_teacher"]), float(got[m]["holdout_mae_vs_teacher"])
        if v1 > v0 * (1.0 + tolerance):
            failures.append(
                f"{m}: holdout MAE {v1:.4f} > {(1+tolerance)*100:.0f}% of baseline {v0:.4f}")
    return failures


def compare_frontier_to_baseline(rows, baseline_rows):
    """Frontier (trained-teacher, serving-point) regressions judged against
    holdout noise: a variant regresses only if its bootstrap-CI lower bound on
    abs-rel-vs-teacher exceeds the baseline's CI upper bound — the statistical
    test VERDICT r4 asked for instead of eyeballing fourth decimals.  Rows
    without CIs (pre-r5 artifacts) fall back to a 10% margin.  Baseline rows
    whose variant name contains ``probe`` are one-off diagnostics (e.g. r4's
    ``nano_24k_768corpus_scaling_probe``), not ladder points — they are not
    required to recur in later rounds."""
    got = {r.get("variant"): r for r in rows
           if "holdout_absrel_vs_teacher" in r}
    failures = []
    for b in baseline_rows:
        v = b.get("variant")
        if v is None or "holdout_absrel_vs_teacher" not in b or "probe" in v:
            continue
        if v not in got:
            failures.append(f"frontier {v}: missing from current run")
            continue
        g = got[v]
        b_hi = (b.get("holdout_absrel_vs_teacher_ci95")
                or [None, 1.1 * float(b["holdout_absrel_vs_teacher"])])[1]
        g_lo = (g.get("holdout_absrel_vs_teacher_ci95")
                or [float(g["holdout_absrel_vs_teacher"]), None])[0]
        if g_lo > b_hi:
            failures.append(
                f"frontier {v}: absrel-vs-teacher CI low {g_lo:.5f} above "
                f"baseline CI high {b_hi:.5f} (significant regression)")
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--presets", default=",".join(PRESETS))
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="DISTILL.json")
    ap.add_argument("--chip_rows", default="",
                    help="distill_chip.py --out artifact(s, comma-separated) to "
                         "embed as the frontier; after the first file, teacher "
                         "rows are renamed teacher_depth4_<WxH> from their file's "
                         "student resolution (the r04 colon-row convention)")
    ap.add_argument("--extra_sections", default="",
                    help="name=path[,name=path...] row-list JSONs embedded as "
                         "additional top-level sections (diagnostic families "
                         "excluded from the frontier regression check, e.g. "
                         "rich_family=..., f32_probe=..., scene_floors=...)")
    ap.add_argument("--fps", default="",
                    help="BENCH_turbo_r*.json to join fps onto the frontier rows")
    ap.add_argument("--baseline", default="",
                    help="previous round's DISTILL artifact to regression-check")
    ap.add_argument("--tolerance", type=float, default=0.15)
    ap.add_argument("--skip_probes", action="store_true",
                    help="only assemble/merge (probes take ~minutes per preset)")
    ap.add_argument("--probes_from", default="",
                    help="reuse capacity_probes from a prior artifact (or bare "
                         "row-list JSON) instead of re-running them — the "
                         "assembly path when probes ran in a separate process")
    args = ap.parse_args(argv)

    probes = []
    if args.probes_from:
        with open(args.probes_from) as f:
            loaded = json.load(f)
        probes = loaded["capacity_probes"] if isinstance(loaded, dict) else loaded
    elif not args.skip_probes:
        from tools import distill_quality

        for name in args.presets.split(","):
            print(f"# capacity probe: {name}", file=sys.stderr, flush=True)
            probes.append(distill_quality.main(["--cpu", "--variant", name.strip(),
                                                "--steps", str(args.steps)]))

    artifact = {"capacity_probes": probes}
    if args.chip_rows:
        rows = []
        for i, path in enumerate(args.chip_rows.split(",")):
            with open(path.strip()) as f:
                file_rows = json.load(f)
            if i > 0:
                res = next((r["resolution"] for r in file_rows
                            if "resolution" in r), None)
                for r in file_rows:
                    if r.get("variant", "").startswith("teacher_") and res:
                        r["variant"] = f"{r['variant']}_{res}"
            rows += file_rows
        fps = {}
        if args.fps:
            with open(args.fps) as f:
                for r in json.load(f):
                    m = r.get("metric", "")
                    if m.startswith("turbo_"):
                        fps[m.split("_")[1]] = r["value"]
        for r in rows:
            if r.get("variant") in fps:
                res = r.get("resolution", "576x384")
                r[f"fps_chip_{res}"] = fps[r["variant"]]
        artifact["frontier"] = rows
    for spec in filter(None, args.extra_sections.split(",")):
        name, _, path = spec.partition("=")
        with open(path) as f:
            artifact[name.strip()] = json.load(f)
    artifact["_note"] = (
        "capacity_probes: tools/distill_quality.py (CPU 64x96, warmed-random depth4 "
        "teacher, mirror/rot180 aug) — architecture function-matching capacity, "
        "regression-guarded per round. frontier: tools/distill_chip.py on the v5e — "
        "students distilled from a TRAINED depth4 teacher at the 576x384 serving "
        "point on synthetic colon frames; absrel vs teacher is the BASELINE.json:5 "
        "accuracy metric with the teacher as reference.")

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"# wrote {args.out}", file=sys.stderr)

    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)
        failures = []
        if probes:
            failures += compare_to_baseline(probes, base.get("capacity_probes", []),
                                            args.tolerance)
        if args.chip_rows and base.get("frontier"):
            failures += compare_frontier_to_baseline(artifact["frontier"],
                                                     base["frontier"])
        for msg in failures:
            print(f"REGRESSION: {msg}", file=sys.stderr)
        if failures:
            sys.exit(1)
        print(f"# no regressions vs {args.baseline}", file=sys.stderr)


if __name__ == "__main__":
    main()
