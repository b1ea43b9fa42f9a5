"""Tests for the loss pipelines: numeric oracles for the basic terms, structural +
gradient checks for each experiment pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.geometry import make_intrinsics_matrix, scale_intrinsics_pyramid
from tf_depth_estimation_tpu.losses import (
    LossWeights,
    depth_only_loss,
    depth_only_val_loss,
    depth_then_cam_loss,
    explain_reg_loss,
    on_demon_loss,
    optflow_combine_loss,
    pairwise_depth_loss,
    reference_explain_mask,
    second_order_smoothness,
    si_log_rmse,
    single_depth_loss,
)

rng = np.random.RandomState(3)
H, W = 64, 96


def _weights(**kw):
    base = dict(height=H, width=W, num_scales=4, max_steps=3000)
    base.update(kw)
    return LossWeights(**base)


def _pyramid(channels=1, scales=4, lo=0.5, hi=2.0):
    return [
        jnp.array(rng.uniform(lo, hi, (2, H // 2**s, W // 2**s, channels)).astype(np.float32))
        for s in range(scales)
    ]


def _label():
    return jnp.array(rng.uniform(0.5, 2.0, (2, H, W, 1)).astype(np.float32))


def _images():
    return (
        jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
        jnp.array(rng.rand(2, H, W, 3).astype(np.float32)),
    )


def _intrinsics():
    K = make_intrinsics_matrix(
        jnp.full((2,), 50.0), jnp.full((2,), 50.0), jnp.full((2,), W / 2), jnp.full((2,), H / 2)
    )
    return scale_intrinsics_pyramid(K, 4)


def test_second_order_smoothness_oracle():
    x = rng.rand(2, 8, 9, 1).astype(np.float32)
    got = float(second_order_smoothness(jnp.array(x)))
    dy = x[:, 1:] - x[:, :-1]
    dx = x[:, :, 1:] - x[:, :, :-1]
    exp = (
        np.abs(dx[:, :, 1:] - dx[:, :, :-1]).mean()
        + np.abs(dx[:, 1:] - dx[:, :-1]).mean()
        + np.abs(dy[:, :, 1:] - dy[:, :, :-1]).mean()
        + np.abs(dy[:, 1:] - dy[:, :-1]).mean()
    )
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_smoothness_zero_for_planes():
    """Second-order smoothness must vanish on affine ramps (its defining property)."""
    yy, xx = np.meshgrid(np.arange(10), np.arange(12), indexing="ij")
    plane = (0.3 * xx + 0.7 * yy + 1.0)[None, ..., None].astype(np.float32)
    assert float(second_order_smoothness(jnp.array(plane))) < 1e-5


def test_explain_reg_loss_oracle():
    logits = rng.randn(2, 4, 4, 2).astype(np.float32)
    ref = np.array(reference_explain_mask(2, 16, 16, 2))
    got = float(explain_reg_loss(jnp.array(logits), jnp.array(ref)))
    # softmax CE against one-hot [0, 1] == -log softmax[..., 1]
    z = logits.reshape(-1, 2)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    np.testing.assert_allclose(got, -logp[:, 1].mean(), rtol=1e-5)


def test_si_log_rmse_matches_reference_formula():
    # the reference ADDS mean(d)^2 (train_depth_only.py:248-249) — not the Eigen metric
    label = rng.uniform(0.5, 2.0, (1, 8, 8, 1)).astype(np.float32)
    pred = rng.uniform(0.5, 2.0, (1, 8, 8, 1)).astype(np.float32)
    d = np.log(label) - np.log(pred)
    exp = np.sqrt((d * d).mean() + d.mean() ** 2)
    np.testing.assert_allclose(float(si_log_rmse(jnp.array(label), jnp.array(pred))),
                               exp, rtol=1e-5)
    # exact prediction -> zero
    assert float(si_log_rmse(jnp.array(label), jnp.array(label))) < 1e-6


def test_depth_only_loss_perfect_prediction():
    w = _weights()
    label = _label()
    preds = [jnp.array(np.array(jnp.clip(jnp.mean(label) * jnp.ones((2, H // 2**s, W // 2**s, 1)), 0.5, 2)))
             for s in range(4)]
    total, comps = depth_only_loss(preds, label, w)
    assert float(comps["smooth"]) < 1e-5  # constant prediction has zero curvature
    assert np.isfinite(float(total))


def test_single_depth_loss_sig_ramp():
    w = _weights(depth_sig_weight=100.0)
    label = _label()
    preds = _pyramid()
    t0, c0 = single_depth_loss(preds, label, 0, w)
    t1, c1 = single_depth_loss(preds, label, w.max_steps, w)
    assert float(c0["sig"]) == 0.0  # ramp starts at zero
    assert float(c1["sig"]) > 0.0
    assert float(c0["depth"]) == pytest.approx(float(c1["depth"]), rel=1e-6)


def test_single_depth_loss_nan_labels_guarded():
    w = _weights()
    label = _label().at[:, :8].set(jnp.nan)
    preds = _pyramid()
    total, comps = single_depth_loss(preds, label, 100, w)
    # sig term sees NaNs (reference applies no guard there; labels are finite in practice),
    # but the guarded L1 term must stay finite
    assert np.isfinite(float(comps["depth"]))

    g = jax.grad(
        lambda p: single_depth_loss(p, label, 100, _weights(depth_sig_weight=0.0))[1]["depth"]
    )(preds)
    assert all(bool(jnp.all(jnp.isfinite(gi))) for gi in g)


def test_pairwise_depth_loss_truncated_structure():
    w = _weights(depth_weight=500.0, cam_weight_rot=160.0, cam_weight_tran=10.0,
                 depth_sig_weight=1000.0)
    left, right = _images()
    label = _label()
    # truncated predictions: scales 2, 3 only
    pd_l = [_pyramid()[2], _pyramid()[3]]
    pd_r = [_pyramid()[2], _pyramid()[3]]
    poses_r = jnp.array(rng.randn(2, 1, 6).astype(np.float32) * 0.1)
    poses_l = jnp.array(rng.randn(2, 1, 6).astype(np.float32) * 0.1)
    gt_cam = jnp.array(rng.randn(2, 6).astype(np.float32) * 0.1)
    total, comps = pairwise_depth_loss(
        left, right, pd_l, poses_r, None, pd_r, poses_l, None,
        gt_cam, _intrinsics(), label, 1000, w,
    )
    for k in ("depth", "cam", "sig"):
        assert float(comps[k]) > 0, k
    assert float(comps["pixel"]) == 0.0  # data_weight = 0 (split_training parity)
    assert np.isfinite(float(total))


def test_pairwise_depth_loss_cam_zero_for_exact_pose():
    w = _weights(cam_weight_rot=1.0, cam_weight_tran=1.0, depth_weight=0.0)
    left, right = _images()
    label = _label()
    pd = [_pyramid()[2], _pyramid()[3]]
    gt_cam = jnp.array(rng.randn(2, 6).astype(np.float32) * 0.2)
    from tf_depth_estimation_tpu.geometry.pose import invert_transform, pose_vec_to_mat
    from tf_depth_estimation_tpu.geometry.rotations import matrix_to_axis_angle

    # pred_r == gt; pred_l == inverse(gt) expressed as a 6-dof angleaxis vector
    Tinv = invert_transform(pose_vec_to_mat(gt_cam, "angleaxis"))
    axis, angle = matrix_to_axis_angle(Tinv[:, :3, :3])
    pose_l = jnp.concatenate([Tinv[:, :3, 3], axis * angle[:, None]], axis=-1)
    total, comps = pairwise_depth_loss(
        left, right, pd, gt_cam[:, None, :], None, pd, pose_l[:, None, :], None,
        gt_cam, _intrinsics(), label, 0, w,
    )
    assert float(comps["cam"]) < 1e-8


def test_pairwise_full_scales_with_exp_and_consistency():
    w = _weights(depth_weight=500.0, cam_weight_rot=160.0, cam_weight_tran=10.0,
                 depth_sig_weight=1000.0, explain_reg_weight=1.0, data_weight=1.0,
                 depth_weight_consist=10.0)
    left, right = _images()
    label = _label()
    pd_l, pd_r = _pyramid(), _pyramid()
    exps_l = [jnp.array(rng.randn(2, H // 2**s, W // 2**s, 2).astype(np.float32)) for s in range(4)]
    exps_r = [jnp.array(rng.randn(2, H // 2**s, W // 2**s, 2).astype(np.float32)) for s in range(4)]
    poses = jnp.array(rng.randn(2, 1, 6).astype(np.float32) * 0.1)
    gt_cam = jnp.array(rng.randn(2, 6).astype(np.float32) * 0.1)
    total, comps = pairwise_depth_loss(
        left, right, pd_l, poses, exps_l, pd_r, poses, exps_r,
        gt_cam, _intrinsics(), label, 500, w, full_scales=True,
    )
    for k in ("depth", "cam", "sig", "pixel", "exp", "consist"):
        assert float(comps[k]) > 0, k
    assert np.isfinite(float(total))


def test_depth_then_cam_loss():
    w = _weights(data_weight=1.0, explain_reg_weight=0.2)
    left, right = _images()
    disps = _pyramid(lo=0.5, hi=3.5)
    exps = [jnp.array(rng.randn(2, H // 2**s, W // 2**s, 2).astype(np.float32)) for s in range(4)]
    poses = jnp.array(rng.randn(2, 1, 6).astype(np.float32) * 0.01)
    total, comps = depth_then_cam_loss(left, right, disps, poses, exps, _intrinsics(), w)
    for k in ("pixel", "smooth", "exp"):
        assert float(comps[k]) > 0, k

    # gradient flows to poses through the warp
    def loss_of_pose(p):
        t, _ = depth_then_cam_loss(left, right, disps, p, exps, _intrinsics(), w)
        return t

    g = jax.grad(loss_of_pose)(poses)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0


def test_optflow_combine_loss():
    w = _weights(smooth_weight=0.5, data_weight=0.5, optflow_weight=1.0, depth_weight=50.0)
    left, right = _images()
    label = _label()
    depths = _pyramid()
    fx = _pyramid(lo=-1, hi=1)
    fy = _pyramid(lo=-1, hi=1)
    proj = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    total, comps = optflow_combine_loss(left, right, depths, fx, fy, label, proj,
                                        _intrinsics(), w)
    for k in ("depth", "smooth", "optflow", "pixel"):
        assert float(comps[k]) > 0, k
    assert np.isfinite(float(total))


def test_on_demon_loss_total_is_smooth_only():
    w = _weights()
    label = _label()
    preds = _pyramid()
    total, comps = on_demon_loss(preds, label, w)
    np.testing.assert_allclose(float(total), float(comps["smooth"]), rtol=1e-6)
    assert float(comps["depth"]) > 0  # computed for logging


def test_depth_only_val_loss_scale_invariant():
    w = _weights()
    label = _label()
    preds = [3.0 * jnp.array(np.array(jnp.clip(
        jnp.ones((2, H // 2**s, W // 2**s, 1)) * jnp.mean(label), 0.5, 2.0)))
        for s in range(4)]
    # pred = 3 * const — scale error contributes nothing beyond distribution shape
    total, comps = depth_only_val_loss(preds, label, w)
    assert np.isfinite(float(total))
