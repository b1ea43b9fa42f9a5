"""Tests for the distill-quality regression artifact tooling (tools/bench_distill.py)."""
import json
import sys

sys.path.insert(0, "/root/repo")  # tools/ is a repo-root package

from tools.bench_distill import compare_to_baseline, main


def _probe(name, mae):
    return {"metric": f"turbo_{name}_distill_quality_96x64_400steps",
            "holdout_mae_vs_teacher": mae, "holdout_absrel_vs_teacher": mae / 2}


def test_compare_flags_regressions_and_missing():
    base = [_probe("nano", 0.148), _probe("pico", 0.171)]
    ok = [_probe("nano", 0.150), _probe("pico", 0.165)]
    assert compare_to_baseline(ok, base, tolerance=0.15) == []
    worse = [_probe("nano", 0.148 * 1.2)]  # regressed + pico dropped
    failures = compare_to_baseline(worse, base, tolerance=0.15)
    assert len(failures) == 2
    assert any("pico" in f and "missing" in f for f in failures)


def test_assembly_joins_chip_rows_and_fps(tmp_path):
    chip = [{"variant": "teacher_depth4", "holdout_absrel_vs_gt": 0.1},
            {"variant": "nano", "holdout_absrel_vs_teacher": 0.02}]
    fps = [{"metric": "turbo_nano_frames_per_sec_per_chip_576x384_b128",
            "value": 10295.5}]
    chip_p, fps_p, out_p = tmp_path / "c.json", tmp_path / "f.json", tmp_path / "o.json"
    chip_p.write_text(json.dumps(chip))
    fps_p.write_text(json.dumps(fps))
    main(["--skip_probes", "--chip_rows", str(chip_p), "--fps", str(fps_p),
          "--out", str(out_p)])
    got = json.loads(out_p.read_text())
    rows = {r["variant"]: r for r in got["frontier"]}
    assert rows["nano"]["fps_chip_576x384"] == 10295.5
    assert "fps_chip_576x384" not in rows["teacher_depth4"]
    assert got["capacity_probes"] == []


def test_assembly_merges_multi_file_rows_and_extra_sections(tmp_path):
    """Round-5 assembly: several distill_chip row files merge into one frontier
    (later files' teacher rows renamed by their student resolution, the r04
    colon convention), fps fields are keyed by each row's own resolution, and
    --extra_sections embeds diagnostic row lists as named top-level keys."""
    main_rows = [{"variant": "teacher_depth4", "holdout_absrel_vs_gt": 0.06},
                 {"variant": "nano", "holdout_absrel_vs_teacher": 0.003,
                  "resolution": "576x384"}]
    colon_rows = [{"variant": "teacher_depth4", "holdout_absrel_vs_gt": 0.065},
                  {"variant": "colon", "holdout_absrel_vs_teacher": 0.005,
                   "resolution": "720x240"}]
    rich_rows = [{"variant": "nano", "scene_family": "rich",
                  "holdout_absrel_vs_teacher": 0.085}]
    fps = [{"metric": "turbo_nano_f", "value": 10504.4},
           {"metric": "turbo_colon_f", "value": 7295.9}]
    paths = {}
    for name, data in [("m", main_rows), ("c", colon_rows), ("r", rich_rows),
                       ("f", fps)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(data))
        paths[name] = str(p)
    out_p = tmp_path / "o.json"
    main(["--skip_probes", "--chip_rows", f"{paths['m']},{paths['c']}",
          "--fps", paths["f"], "--extra_sections", f"rich_family={paths['r']}",
          "--out", str(out_p)])
    got = json.loads(out_p.read_text())
    rows = {r["variant"]: r for r in got["frontier"]}
    assert set(rows) == {"teacher_depth4", "nano", "teacher_depth4_720x240",
                         "colon"}
    assert rows["nano"]["fps_chip_576x384"] == 10504.4
    assert rows["colon"]["fps_chip_720x240"] == 7295.9
    assert got["rich_family"] == rich_rows


def test_eval_depth_chip_scores_npz_weights(tmp_path):
    """tools/eval_depth_chip.py scores a .npz-weights model on the distill
    holdout and returns finite one-ruler metrics (CPU, tiny shapes)."""
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant
    from tf_depth_estimation_tpu.train.checkpoint import save_variables_npz
    from tools.eval_depth_chip import main as eval_main

    model = TurboDepthNet(TurboVariant.nano(), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32))
    path = str(tmp_path / "nano.npz")
    save_variables_npz(path, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]},
                       variant="nano")

    row = eval_main(["--weights", path, "--model", "turbo:nano",
                     "--height", "64", "--width", "96", "--holdout_frames", "2",
                     "--batch_size", "2", "--cpu", "--label", "unit"])
    assert row["resolution"] == "96x64"
    for k in ("holdout_absrel_vs_gt", "holdout_mae_vs_gt",
              "holdout_si_log_rmse_vs_gt"):
        assert row[k] > 0 and row[k] < 100


def test_frontier_comparison_uses_cis():
    from tools.bench_distill import compare_frontier_to_baseline

    def row(v, mean, lo, hi):
        return {"variant": v, "holdout_absrel_vs_teacher": mean,
                "holdout_absrel_vs_teacher_ci95": [lo, hi]}

    base = [row("nano", 0.026, 0.024, 0.028), {"variant": "teacher_depth4"}]
    # overlapping CIs: a higher mean is NOT a regression
    ok = [row("nano", 0.0275, 0.0255, 0.0295)]
    assert compare_frontier_to_baseline(ok, base) == []
    # disjoint CIs above baseline: regression; missing variant: regression
    bad = [row("pico", 0.03, 0.029, 0.031)]
    failures = compare_frontier_to_baseline(bad, base)
    assert any("missing" in f for f in failures)
    worse = [row("nano", 0.035, 0.033, 0.037)]
    failures = compare_frontier_to_baseline(worse, base)
    assert len(failures) == 1 and "significant regression" in failures[0]
    # pre-r5 baseline rows without CIs fall back to a 10% margin
    base_nociv = [{"variant": "nano", "holdout_absrel_vs_teacher": 0.026}]
    assert compare_frontier_to_baseline(
        [row("nano", 0.028, 0.027, 0.029)], base_nociv) == []
    assert compare_frontier_to_baseline(
        [row("nano", 0.031, 0.030, 0.032)], base_nociv)
