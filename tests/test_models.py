"""Shape/behavior tests for the model families (SURVEY §2.1 output contracts)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.models import (
    DepthPoseNet,
    DispNet,
    DispNetVariant,
    PoseExpNet,
    UpconvNet,
)

H, W = 96, 128  # small but deep enough to exercise all 7 encoder stages


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        return model.apply(
            x=x, train=True, variables=variables, mutable=["batch_stats"]
        )
    return model.apply(variables, x, train=False), variables


@pytest.mark.parametrize(
    "variant,n_outputs,channels",
    [
        (DispNetVariant.depth4(), 4, 1),
        (DispNetVariant.sfm(), 4, 3),
        (DispNetVariant.depth4_nobn(), 4, 1),
        (DispNetVariant.depth10_flow(), 8, 1),
    ],
)
def test_dispnet_variants_output_contract(variant, n_outputs, channels):
    model = DispNet(variant)
    x = jnp.zeros((1, H, W, 3))
    outs, _ = _init_and_apply(model, x)
    assert len(outs) == n_outputs
    # 4 disparity scales: full, 1/2, 1/4, 1/8 resolution
    for s in range(4):
        assert outs[s].shape == (1, H // 2**s, W // 2**s, channels), s
    if n_outputs == 8:  # flow decoder: 2-channel, same scales
        for s in range(4):
            assert outs[4 + s].shape == (1, H // 2**s, W // 2**s, 2)
    if variant.head_activation == "sigmoid":
        d = np.array(outs[0])
        assert d.min() >= variant.min_disp
        assert d.max() <= variant.disp_scaling + variant.min_disp


def test_dispnet_sigmoid_range_and_batch_stats():
    model = DispNet(DispNetVariant.depth4())
    x = jnp.array(np.random.RandomState(0).rand(2, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=True)
    assert "batch_stats" in variables
    outs, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running stats must actually update in train mode
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(
        not np.allclose(np.array(b), np.array(a)) for b, a in zip(before, after)
    )


def test_dispnet_nobn_has_no_batch_stats():
    model = DispNet(DispNetVariant.depth4_nobn())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=True)
    assert "batch_stats" not in variables


def test_depth_pose_net_truncated():
    model = DepthPoseNet(full_resolution=False)
    x = jnp.zeros((2, H, W, 6))
    (disps, pose, masks), _ = _init_and_apply(model, x)
    assert len(disps) == 2  # [disp3, disp4] — nets_optflow_depth.py:276
    assert disps[0].shape == (2, H // 4, W // 4, 1)
    assert disps[1].shape == (2, H // 8, W // 8, 1)
    assert pose.shape == (2, 1, 6)
    assert len(masks) == 2
    assert masks[0].shape == (2, H // 4, W // 4, 2)
    assert masks[1].shape == (2, H // 8, W // 8, 2)


def test_depth_pose_net_full_resolution():
    model = DepthPoseNet(full_resolution=True)
    x = jnp.zeros((1, H, W, 6))
    (disps, pose, masks), _ = _init_and_apply(model, x)
    assert len(disps) == 4 and len(masks) == 4
    for s in range(4):
        assert disps[s].shape == (1, H // 2**s, W // 2**s, 1), s
        assert masks[s].shape == (1, H // 2**s, W // 2**s, 2), s
    assert pose.shape == (1, 1, 6)


def test_pose_exp_net():
    model = PoseExpNet(num_source=2)
    x = jnp.zeros((1, H, W, 9))  # target + 2 sources
    (pose, masks), _ = _init_and_apply(model, x)
    assert pose.shape == (1, 2, 6)
    assert len(masks) == 4
    # mask1 at full res (cnv5 at /32, five deconvs back to /1), mask4 at /8
    assert masks[0].shape == (1, H, W, 4)
    assert masks[3].shape == (1, H // 8, W // 8, 4)
    # 0.01 scaling keeps initial poses tiny
    assert float(jnp.max(jnp.abs(pose))) < 1.0


def test_upconv_net():
    model = UpconvNet()
    # lateral-conv channels must match the endpoint they are added to
    # (ref nets_optflow_depth.py:295-320: 512, 256, 64, 64)
    eps = [
        jnp.zeros((1, H // 32, W // 32, 2048)),
        jnp.zeros((1, H // 16, W // 16, 512)),
        jnp.zeros((1, H // 8, W // 8, 256)),
        jnp.zeros((1, H // 4, W // 4, 64)),
        jnp.zeros((1, H // 2, W // 2, 64)),
    ]
    variables = model.init(jax.random.PRNGKey(0), eps, train=True)
    disps = model.apply(variables, eps, train=False)
    assert len(disps) == 4


def test_dispnet_odd_input_sizes():
    """resize_like patches must absorb odd intermediate sizes (ref needs this for 240x720:
    240/16=15 odd at cnv4b)."""
    model = DispNet(DispNetVariant.depth4())
    x = jnp.zeros((1, 120, 180, 3))
    outs, _ = _init_and_apply(model, x)
    assert outs[0].shape == (1, 120, 180, 1)


def test_dispnet_gradient_flows():
    model = DispNet(DispNetVariant.depth4())
    # batch 2: with batch 1 the 1x1-spatial cnv7b is fully normalized away by train-mode
    # batch-norm (single element per channel), exactly as in slim — grads would be 0 there
    x = jnp.array(np.random.RandomState(0).rand(2, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.mean(o) for o in outs)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # every layer receives gradient
    nonzero = sum(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
    assert nonzero == len(leaves)


def test_dispnet_bfloat16_compute():
    model = DispNet(DispNetVariant.depth4(), dtype=jnp.bfloat16)
    x = jnp.zeros((1, H, W, 3))
    outs, variables = _init_and_apply(model, x)
    # params stay f32, heads emit f32
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(variables["params"])
    )
    assert outs[0].dtype == jnp.float32
