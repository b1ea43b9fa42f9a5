"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY §4 fake-mesh strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
from tf_depth_estimation_tpu.parallel import (
    batch_sharding,
    make_dp_step,
    make_mesh,
    shard_batch,
)
from tf_depth_estimation_tpu.train.state import create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_depth_only_step

rng = np.random.RandomState(5)
H, W = 32, 64


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}


def test_shard_batch_places_leading_dim():
    mesh = make_mesh(8)
    batch = {"x": np.zeros((16, 4, 4, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["x"].addressable_shards]
    assert all(shape == (2, 4, 4, 3) for shape in shard_shapes)


def test_dp_step_matches_single_device():
    """The data-parallel step must produce the same loss/params as single-device
    (same global batch): XLA's all-reduced grads == full-batch grads."""
    w = LossWeights(height=H, width=W, smooth_weight=0.0)
    model = DispNet(DispNetVariant.depth4())
    batch = {
        "tgt_image": rng.rand(8, H, W, 3).astype(np.float32),
        "label": rng.uniform(1.0, 2.0, (8, H, W, 1)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    state1 = create_train_state(model, jb["tgt_image"], learning_rate=1e-3)
    step1 = jit_step(make_depth_only_step(w), donate_state=False)
    state1b, m1 = step1(state1, jb)

    mesh = make_mesh(8)
    state2 = create_train_state(model, jb["tgt_image"], learning_rate=1e-3)
    dp = make_dp_step(make_depth_only_step(w), mesh, donate_state=False)
    state2b, m2 = dp(state2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=2e-4)
    a = jax.tree_util.tree_leaves(state1b.params)
    b = jax.tree_util.tree_leaves(state2b.params)
    # Adam's update is ~±lr per param; near-zero grads whose cross-device reduction
    # order differs can flip sign, so params may differ by up to ~2*lr on a tiny
    # fraction of elements — bound by the Adam step scale, not exact equality.
    lr = 1e-3
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.array(x), np.array(y), atol=2.5 * lr)


def test_multichip_predictor_matches_single():
    from tf_depth_estimation_tpu.infer import DepthPredictor

    model = DispNet(DispNetVariant.depth4())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=True)
    frames = rng.rand(8, H, W, 3).astype(np.float32)
    kw = dict(height=H, width=W, batch_size=8, dtype=jnp.float32)
    p1 = DepthPredictor(variables["params"], variables.get("batch_stats"), **kw)
    p8 = DepthPredictor(variables["params"], variables.get("batch_stats"),
                        num_devices=8, **kw)
    np.testing.assert_allclose(p1.predict_array(frames), p8.predict_array(frames),
                               rtol=2e-4, atol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dp_gradients_match_single_device_exactly():
    """Gradient-level DP invariant (VERDICT r1 weak #6): the all-reduced grads of the
    sharded batch equal the full-batch grads to float tolerance, BEFORE the optimizer
    can mask small reduction errors behind Adam's sign dynamics."""
    from tf_depth_estimation_tpu.losses.pipelines import depth_only_loss
    from tf_depth_estimation_tpu.train.steps import _forward

    w = LossWeights(height=H, width=W, smooth_weight=0.1)
    # bn-free variant: batch-norm's distributed variance (E[x^2]-E[x]^2 cancellation)
    # adds ~1e-3 relative noise through 30 layers that would force a mushy tolerance;
    # sync-BN equivalence is covered by the param-level test above.
    model = DispNet(DispNetVariant.depth4_nobn())
    batch = {
        "tgt_image": rng.rand(8, H, W, 3).astype(np.float32),
        "label": rng.uniform(1.0, 2.0, (8, H, W, 1)).astype(np.float32),
    }
    state = create_train_state(model, jnp.asarray(batch["tgt_image"]),
                               learning_rate=1e-3)

    def loss(params, b):
        preds, _ = _forward(state, params, b["tgt_image"], train=True)
        total, _ = depth_only_loss(preds, b["label"], w)
        return total

    g1 = jax.jit(jax.grad(loss))(state.params,
                                 {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(8)
    from tf_depth_estimation_tpu.parallel.mesh import replicated_sharding

    repl = replicated_sharding(mesh)
    gdp = jax.jit(jax.grad(loss), in_shardings=(repl, batch_sharding(mesh)),
                  out_shardings=repl)(state.params, shard_batch(batch, mesh))

    for x, y in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(gdp)):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-6)
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-6 * scale)
