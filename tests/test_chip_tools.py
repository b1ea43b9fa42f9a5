"""CPU smokes for the on-chip campaign tools (tools/train_colon_chip.py,
tools/distill_chip.py) — the round-5 plumbing: device-side augmentation of
(frame, label), val-early-stop + best.npz export, .npz teachers, bootstrap CIs.

Tiny shapes; the real campaigns run these same code paths on the v5e.
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")  # tools/ is a repo-root package


def test_train_colon_chip_aug_early_stop_best_npz(tmp_path, capsys):
    from tools.train_colon_chip import main as train_main

    ckpt = str(tmp_path / "ck")
    train_main([
        "--model", "turbo:nano", "--height", "64", "--width", "96",
        "--steps", "30", "--batch_size", "4", "--train_frames", "8",
        "--val_frames", "2", "--validation_check", "5",
        "--early_stop_patience", "1", "--summary_freq", "10",
        "--save_latest_freq", "30", "--dtype", "float32",
        "--checkpoint_dir", ckpt, "--cpu",
    ])
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")][-1]
    row = json.loads(out)
    assert row["augmented"] is True
    assert row["best_weights"] and row["best_step"] >= 0
    assert row["best_val_si_log_rmse"] == min(row["val_history"])

    from tf_depth_estimation_tpu.train.checkpoint import load_variables_npz

    tree, meta = load_variables_npz(row["best_weights"])
    assert meta["model"] == "turbo:nano"
    assert int(meta["step"]) == row["best_step"]
    assert set(tree) >= {"params", "batch_stats"}


def test_distill_chip_npz_teacher_and_ci(tmp_path):
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.checkpoint import save_variables_npz
    from tools.distill_chip import main as distill_main

    teacher = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: teacher.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32))
    tw = str(tmp_path / "teacher.npz")
    save_variables_npz(tw, {"params": variables["params"],
                            "batch_stats": variables["batch_stats"]},
                       step="123")

    out = str(tmp_path / "rows.json")
    distill_main([
        "--teacher_weights", tw, "--variants", "nano",
        "--height", "64", "--width", "96", "--steps", "4",
        "--batch_size", "2", "--corpus_frames", "6", "--holdout_frames", "4",
        "--summary_freq", "2", "--out", out, "--cpu",
    ])
    rows = json.loads(open(out).read())
    assert rows[0]["variant"] == "teacher_depth4"
    assert rows[0]["teacher_step"] == 123
    lo, hi = rows[0]["holdout_absrel_vs_gt_ci95"]
    assert lo <= rows[0]["holdout_absrel_vs_gt"] <= hi
    student = rows[1]
    assert student["teacher_step"] == 123
    assert student["holdout_frames"] == 4
    lo, hi = student["holdout_absrel_vs_teacher_ci95"]
    assert lo <= student["holdout_absrel_vs_teacher"] <= hi
    assert np.isfinite(student["distill_loss_last"])


def test_distill_chip_corpus_cache_and_photo_jitter(tmp_path):
    """The round-5 scaling-probe plumbing: on-disk corpus cache (hit == miss
    bytes) and per-sample photometric gain jitter through the distill step."""
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.checkpoint import save_variables_npz
    from tools.distill_chip import cached_corpus, main as distill_main

    cdir = str(tmp_path / "corpus")
    a = cached_corpus(cdir, 5, 32, 48, seed=7)            # miss: generates + saves
    b = cached_corpus(cdir, 5, 32, 48, seed=7)            # hit: loads
    np.testing.assert_array_equal(a, b)
    ha, hd = cached_corpus(cdir, 3, 32, 48, seed=9, keep_depth=True)
    hb, hdb = cached_corpus(cdir, 3, 32, 48, seed=9, keep_depth=True)
    np.testing.assert_array_equal(hd, hdb)
    assert len({p.name for p in (tmp_path / "corpus").iterdir()}) == 2

    teacher = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: teacher.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32))
    tw = str(tmp_path / "teacher.npz")
    save_variables_npz(tw, {"params": variables["params"],
                            "batch_stats": variables["batch_stats"]}, step="1")
    out = str(tmp_path / "rows.json")
    distill_main([
        "--teacher_weights", tw, "--variants", "nano",
        "--height", "64", "--width", "96", "--steps", "3",
        "--batch_size", "2", "--corpus_frames", "4", "--holdout_frames", "2",
        "--summary_freq", "2", "--photo_jitter", "0.3",
        "--corpus_cache", cdir, "--out", out, "--cpu",
    ])
    rows = json.loads(open(out).read())
    student = rows[1]
    assert student["photo_jitter"] == 0.3
    assert student["corpus_frames"] == 4
    assert np.isfinite(student["distill_loss_last"])
