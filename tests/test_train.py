"""Training-harness tests: single-batch overfit per experiment family (SURVEY §4),
checkpoint round-trips, loop mechanics.  Tiny shapes — CPU-friendly."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.geometry import make_intrinsics_matrix, scale_intrinsics_pyramid
from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
from tf_depth_estimation_tpu.train.loop import MetricLogger, load_into_state, run_training
from tf_depth_estimation_tpu.train.state import adam, create_train_state
from tf_depth_estimation_tpu.train.steps import (
    jit_step,
    make_depth_only_step,
    make_depth_only_val_step,
    make_depth_then_cam_step,
    make_on_demon_step,
    make_optflow_combine_step,
    make_pairwise_step,
)

rng = np.random.RandomState(7)
H, W = 32, 64


def _weights(**kw):
    base = dict(height=H, width=W, num_scales=4, max_steps=300)
    base.update(kw)
    return LossWeights(**base)


def _intrinsics(B):
    K = make_intrinsics_matrix(
        jnp.full((B,), 40.0), jnp.full((B,), 40.0), jnp.full((B,), W / 2), jnp.full((B,), H / 2)
    )
    return scale_intrinsics_pyramid(K, 4)


def test_depth_only_overfits_one_batch():
    w = _weights(smooth_weight=0.0)
    model = DispNet(DispNetVariant.depth4())
    batch = {
        "tgt_image": jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
        "label": jnp.array(rng.uniform(1.0, 2.0, (2, H, W, 1)).astype(np.float32)),
    }
    state = create_train_state(model, batch["tgt_image"], learning_rate=1e-3)
    step = jit_step(make_depth_only_step(w))
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 15


def test_depth_only_val_step():
    w = _weights()
    model = DispNet(DispNetVariant.depth4())
    batch = {
        "tgt_image": jnp.array(rng.rand(1, H, W, 3).astype(np.float32)),
        "label": jnp.array(rng.uniform(1.0, 2.0, (1, H, W, 1)).astype(np.float32)),
    }
    state = create_train_state(model, batch["tgt_image"])
    val = make_depth_only_val_step(w)(state, batch)
    assert np.isfinite(float(val["total"]))


def _demon_batch(B=2):
    return {
        "image_pair": jnp.array(rng.rand(B, H, W, 6).astype(np.float32) - 0.5),
        "depth0": jnp.array(rng.uniform(0.5, 2.0, (B, H, W, 1)).astype(np.float32)),
        "depth2": jnp.array(rng.uniform(0.5, 2.0, (B, H // 4, W // 4, 1)).astype(np.float32)),
        "rotation": jnp.array(rng.randn(B, 3).astype(np.float32) * 0.05),
        "translation": jnp.array(rng.randn(B, 3).astype(np.float32) * 0.1),
        "intrinsics": _intrinsics(B),
    }


def test_pairwise_step_runs_and_decreases():
    w = _weights(depth_weight=500.0, cam_weight_rot=160.0, cam_weight_tran=10.0,
                 depth_sig_weight=0.0, smooth_weight=0.0)
    model = DepthPoseNet(full_resolution=False)
    batch = _demon_batch()
    state = create_train_state(model, batch["image_pair"], learning_rate=1e-3)
    step = jit_step(make_pairwise_step(w))
    losses = []
    for i in range(12):
        state, m = step(state, batch)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0], losses


def test_depth_then_cam_step_runs():
    w = _weights(data_weight=1.0, explain_reg_weight=0.2, smooth_weight=1.0)
    model = DepthPoseNet(full_resolution=True)
    batch = _demon_batch()
    state = create_train_state(model, batch["image_pair"], learning_rate=1e-4)
    step = jit_step(make_depth_then_cam_step(w))
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["total"]))
    assert float(m["pixel"]) > 0 and float(m["exp"]) > 0


def test_optflow_combine_step_runs():
    w = _weights(smooth_weight=0.5, data_weight=0.5, optflow_weight=1.0, depth_weight=50.0)
    model = DispNet(DispNetVariant.depth10_flow())
    batch = {
        "tgt_image": jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
        "src_image": jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
        "label": jnp.array(rng.uniform(0.5, 2.0, (2, H, W, 1)).astype(np.float32)),
        "tgt2src_projs": jnp.broadcast_to(jnp.eye(4), (2, 2, 4, 4)),
        "intrinsics": _intrinsics(2),
    }
    state = create_train_state(model, batch["tgt_image"], learning_rate=1e-4)
    step = jit_step(make_optflow_combine_step(w))
    for _ in range(3):
        state, m = step(state, batch)
    for k in ("depth", "smooth", "optflow", "pixel"):
        assert np.isfinite(float(m[k])), k


def test_on_demon_step_runs():
    w = _weights()
    model = DepthPoseNet(full_resolution=False)
    batch = _demon_batch()
    state = create_train_state(model, batch["image_pair"])
    step = jit_step(make_on_demon_step(w))
    state, m = step(state, batch)
    # faithful: total == smooth only
    np.testing.assert_allclose(float(m["total"]), float(m["smooth"]), rtol=1e-6)


def test_checkpoint_roundtrip_and_groups(tmp_path):
    model = DispNet(DispNetVariant.depth4())
    x = jnp.zeros((1, H, W, 3))
    state = create_train_state(model, x)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    from tf_depth_estimation_tpu.train.loop import _save_tree

    mgr.save(5, {"model_pairdepth": _save_tree(state)})
    assert mgr.latest_step() == 5
    restored = mgr.restore_group("model_pairdepth", like=_save_tree(state))
    new_state = load_into_state(state, restored)
    assert int(new_state.step) == int(state.step)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(new_state.params)
    assert all(np.allclose(np.array(x_), np.array(y_)) for x_, y_ in zip(a, b))
    mgr.close()


def test_run_training_loop(tmp_path):
    w = _weights(smooth_weight=0.0)
    model = DispNet(DispNetVariant.depth4())
    batch = {
        "tgt_image": jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
        "label": jnp.array(rng.uniform(1.0, 2.0, (2, H, W, 1)).astype(np.float32)),
    }
    state = create_train_state(model, batch["tgt_image"], learning_rate=1e-3)
    step = jit_step(make_depth_only_step(w))

    def batches():
        while True:
            yield batch

    logger = MetricLogger(str(tmp_path), quiet=True)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state, last = run_training(
        state=state, train_step=step, batches=batches(), max_steps=6, logger=logger,
        checkpoint=mgr, save_latest_freq=3, summary_freq=2,
    )
    assert int(state.step) == 6
    assert last is not None and "steps_per_sec" in last
    assert mgr.latest_step() == 6
    assert os.path.exists(logger.path)
    mgr.close()


def test_remat_step_matches_plain():
    """jax.checkpoint remat must not change the numerics, only the memory profile."""
    w = _weights(smooth_weight=0.0)
    model = DispNet(DispNetVariant.depth4())
    batch = {
        "tgt_image": jnp.array(np.random.RandomState(3).rand(2, H, W, 3), jnp.float32),
        "label": jnp.array(np.random.RandomState(4).uniform(1.0, 2.0, (2, H, W, 1)),
                           jnp.float32),
    }
    s1 = create_train_state(model, batch["tgt_image"], learning_rate=1e-3)
    s2 = create_train_state(model, batch["tgt_image"], learning_rate=1e-3)
    step1 = jit_step(make_depth_only_step(w), donate_state=False)
    step2 = jit_step(make_depth_only_step(w, remat=True), donate_state=False)
    s1, m1 = step1(s1, batch)
    s2, m2 = step2(s2, batch)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.array(x), np.array(y), atol=1e-6)


def test_train_bench_regression_guard():
    """bench_train.py's artifact comparison flags drops, missing configs, and the
    config-4 Pallas-sampler win (a 24% step-time loss trips the 20% tolerance)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_train", os.path.join(os.path.dirname(__file__), "..", "bench_train.py"))
    bench_train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_train)

    base = [{"metric": "a", "value": 10.0}, {"metric": "b", "value": 7.0}]
    ok = [{"metric": "a", "value": 9.0}, {"metric": "b", "value": 7.1}]
    assert bench_train.compare_to_baseline(ok, base) == []

    # config-4-style regression: Pallas sampler win lost (144.1 -> 188.9 ms/step
    # is 6.9 -> 5.3 steps/s, a 24% drop)
    bad = [{"metric": "a", "value": 10.0}, {"metric": "b", "value": 5.3}]
    fails = bench_train.compare_to_baseline(bad, base)
    assert len(fails) == 1 and "b" in fails[0]

    missing = [{"metric": "a", "value": 10.0}]
    fails = bench_train.compare_to_baseline(missing, base)
    assert len(fails) == 1 and "missing" in fails[0]
