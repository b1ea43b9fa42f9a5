"""Smoke + structure tests for the extended experiment step families
(L/R symmetric, dim11, only-image, flow-only, 3-channel)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.geometry import make_intrinsics_matrix, scale_intrinsics_pyramid
from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant, LRNet
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import (
    jit_step,
    make_dim11_step,
    make_lr_full_step,
    make_lr_gt_step,
    make_only_image_step,
    make_optflow3_step,
    make_optflow_only_step,
)

rng = np.random.RandomState(9)
H, W = 32, 64


def _w(factory, **kw):
    import dataclasses

    return dataclasses.replace(factory(), height=H, width=W, max_steps=100, **kw)


def _intrinsics(B):
    K = make_intrinsics_matrix(
        jnp.full((B,), 40.0), jnp.full((B,), 40.0), jnp.full((B,), W / 2), jnp.full((B,), H / 2)
    )
    return scale_intrinsics_pyramid(K, 4)


def _demon_batch(B=2):
    return {
        "image_pair": jnp.array(rng.rand(B, H, W, 6).astype(np.float32) - 0.5),
        "depth0": jnp.array(rng.uniform(0.5, 2.0, (B, H, W, 1)).astype(np.float32)),
        "depth2": jnp.array(rng.uniform(0.5, 2.0, (B, H // 4, W // 4, 1)).astype(np.float32)),
        "rotation": jnp.array(rng.randn(B, 3).astype(np.float32) * 0.05),
        "translation": jnp.array(rng.randn(B, 3).astype(np.float32) * 0.1),
        "intrinsics": _intrinsics(B),
    }


def _colon_batch(B=2):
    return {
        "tgt_image": jnp.array(rng.rand(B, H, W, 3).astype(np.float32)),
        "src_image": jnp.array(rng.rand(B, H, W, 3).astype(np.float32)),
        "label": jnp.array(rng.uniform(0.5, 2.0, (B, H, W, 1)).astype(np.float32)),
        "tgt2src_projs": jnp.broadcast_to(jnp.eye(4), (B, 2, 4, 4)),
        "intrinsics": _intrinsics(B),
    }


def test_lrnet_output_groups():
    model = LRNet()
    l = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), l, l, train=True)
    # named groups match the reference's two variable scopes
    assert "single" in variables["params"] and "pair" in variables["params"]
    out = model.apply(variables, l, l, train=False)
    assert len(out["single_left"]) == 4 and len(out["pair_left"]) == 4
    assert out["pose_right"].shape == (1, 1, 6)


def test_lr_full_step():
    w = _w(LossWeights.depth_then_cam_lr)
    model = LRNet()
    batch = _demon_batch()
    l = batch["image_pair"][..., :3]
    state = create_train_state(model, (l, l), learning_rate=1e-4)
    step = jit_step(make_lr_full_step(w))
    state, m = step(state, batch)
    for k in ("pixel", "smooth", "exp", "cam", "consist", "depth"):
        assert np.isfinite(float(m[k])) and float(m[k]) > 0, k


def test_lr_gt_step():
    w = _w(LossWeights.gtdepth_gtcam)
    model = LRNet(with_single=False)
    batch = _demon_batch()
    l = batch["image_pair"][..., :3]
    state = create_train_state(model, (l, l), learning_rate=1e-4)
    step = jit_step(make_lr_gt_step(w))
    state, m = step(state, batch)
    for k in ("pixel", "smooth", "exp", "cam", "consist", "depth", "sig"):
        assert np.isfinite(float(m[k])) and float(m[k]) > 0, k


def test_dim11_step():
    w = _w(LossWeights.dim11)
    model = DepthPoseNet(full_resolution=True)
    batch = _colon_batch()
    state = create_train_state(model, jnp.zeros((2, H, W, 6)), learning_rate=1e-4)
    step = jit_step(make_dim11_step(w))
    state, m = step(state, batch)
    for k in ("depth", "smooth", "pixel", "exp"):
        assert np.isfinite(float(m[k])), k


def test_only_image_step():
    w = _w(LossWeights.only_image)
    model = DispNet(DispNetVariant.depth4())
    batch = _colon_batch()
    state = create_train_state(model, jnp.zeros((2, H, W, 6)), learning_rate=1e-4)
    step = jit_step(make_only_image_step(w))
    state, m = step(state, batch)
    assert np.isfinite(float(m["total"])) and float(m["pixel"]) > 0


def test_optflow_only_step():
    w = _w(LossWeights.optflow_only)
    model = DispNet(DispNetVariant.sfm())
    batch = _colon_batch()
    state = create_train_state(model, jnp.zeros((2, H, W, 3)), learning_rate=1e-4)
    step = jit_step(make_optflow_only_step(w))
    state, m = step(state, batch)
    for k in ("pixel", "smooth", "optflow"):
        assert np.isfinite(float(m[k])), k


def test_optflow3_step():
    w = _w(LossWeights.optflow3)
    model = DispNet(DispNetVariant.sfm())
    batch = _colon_batch()
    state = create_train_state(model, jnp.zeros((2, H, W, 6)), learning_rate=1e-4)
    step = jit_step(make_optflow3_step(w))
    state, m = step(state, batch)
    assert np.isfinite(float(m["total"])) and float(m["depth"]) > 0
