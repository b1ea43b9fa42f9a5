"""TF1 checkpoint importer round-trip (VERDICT r1 missing #3).

Writes a synthetic TF1-format (V2) checkpoint through tf.compat.v1.train.Saver with the
reference's slim variable names, imports it through
``tf_depth_estimation_tpu.train.tf1_import`` and checks every value lands in the right
Flax leaf.  Expected names are anchored by hardcoded spot-checks taken from the reference
graphs (``nets_optflow_depth.py:80-276``, ``split_training.py:147,338``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")

from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
from tf_depth_estimation_tpu.train.tf1_import import (
    import_tf1_variables,
    read_tf1_checkpoint,
    tf1_name_for,
)


def _flat_paths(variables):
    leaves, _ = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for keypath, leaf in leaves:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        out.append((path, leaf))
    return out


def _write_tf1_checkpoint(tmp_path, variables, arch, scope):
    """Create a checkpoint holding one TF1 variable per flax leaf, random values."""
    rng = np.random.RandomState(0)
    values = {}
    graph = tf.Graph()
    with graph.as_default():
        for path, leaf in _flat_paths(variables):
            name = tf1_name_for(path, arch, scope)
            val = rng.randn(*leaf.shape).astype(np.float32)
            if name.endswith("moving_variance"):
                val = np.abs(val) + 0.1  # variances must be positive to forward
            elif name.endswith("weights"):
                val *= 0.05  # keep the 30-layer forward finite for the sanity check
            values[name] = val
            tf.compat.v1.get_variable(name, initializer=tf.constant(val))
        saver = tf.compat.v1.train.Saver()
        prefix = str(tmp_path / "model.ckpt")
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix)
    return prefix, values


def test_expected_reference_names():
    """The mapping emits the exact slim names of the reference graphs."""
    assert tf1_name_for(("params", "cnv1", "Conv_0", "kernel"),
                        "depth_pose", "depth_cam_net") == "depth_cam_net/cnv1/weights"
    assert tf1_name_for(("params", "pose_cam_cnv7", "Conv_0", "kernel"),
                        "depth_pose", "depth_cam_net") == \
        "depth_cam_net/pose/cam_cnv7/weights"
    assert tf1_name_for(("params", "pose_pred", "Conv_0", "bias"),
                        "depth_pose", "depth_cam_net") == "depth_cam_net/pose/pred/biases"
    assert tf1_name_for(("params", "exp_upcnv5", "TFConvTranspose_0", "kernel"),
                        "depth_pose", "depth_cam_net") == \
        "depth_cam_net/exp/exp_upcnv5/weights"
    assert tf1_name_for(("params", "mask4", "Conv_0", "bias"),
                        "depth_pose", "depth_cam_net") == "depth_cam_net/exp/mask4/biases"
    assert tf1_name_for(("batch_stats", "encoder", "cnv1", "BatchNorm_0", "mean"),
                        "dispnet", "depth_net") == "depth_net/cnv1/BatchNorm/moving_mean"
    assert tf1_name_for(("params", "decoder", "disp4", "Conv_0", "kernel"),
                        "dispnet", "model_singledepth/depth_net") == \
        "model_singledepth/depth_net/disp4/weights"
    assert tf1_name_for(("params", "decoder", "upcnv7", "TFConvTranspose_0", "kernel"),
                        "dispnet", "depth_net") == "depth_net/upcnv7/weights"


@pytest.mark.parametrize("arch,scope", [
    ("dispnet", "depth_net"),
    ("depth_pose", "model_pairdepth/depth_cam_net"),
])
def test_tf1_import_roundtrip(tmp_path, arch, scope):
    if arch == "dispnet":
        model = DispNet(DispNetVariant.depth4())
        x = jnp.zeros((1, 32, 64, 3))
    else:
        model = DepthPoseNet()
        x = jnp.zeros((1, 32, 64, 6))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    prefix, values = _write_tf1_checkpoint(tmp_path, variables, arch, scope)

    tf1_vars = read_tf1_checkpoint(prefix)
    tree, _ = import_tf1_variables(tf1_vars, variables, arch, scope)

    # every leaf carries exactly the checkpoint value its slim name had
    for path, leaf in _flat_paths(tree):
        name = tf1_name_for(path, arch, scope)
        np.testing.assert_array_equal(np.asarray(leaf), values[name])

    # imported weights run (finite forward)
    out = model.apply(jax.device_put(tree), x, train=False)
    first = out[0][0] if isinstance(out, tuple) else out[0]
    assert np.isfinite(np.asarray(first)).all()


def test_tf1_import_shape_mismatch_raises(tmp_path):
    model = DispNet(DispNetVariant.depth4())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), train=True)
    prefix, _ = _write_tf1_checkpoint(tmp_path, variables, "dispnet", "depth_net")
    tf1_vars = read_tf1_checkpoint(prefix)
    tf1_vars["depth_net/cnv1/weights"] = np.zeros((3, 3, 3, 32), np.float32)
    with pytest.raises(ValueError):
        import_tf1_variables(tf1_vars, variables, "dispnet", "depth_net")
