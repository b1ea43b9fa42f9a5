"""Flat .npz serving-weight files (train/checkpoint.py) — roundtrip + predictor load.

The distilled turbo students from the on-chip campaign are committed under
``weights/`` in this format; these tests lock the encode/decode and that a
TurboPredictor accepts the loaded tree.
"""
import numpy as np
import pytest

from tf_depth_estimation_tpu.train.checkpoint import (
    load_variables_npz,
    save_variables_npz,
)


def test_npz_roundtrip(tmp_path):
    variables = {
        "params": {"conv1": {"kernel": np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4),
                             "bias": np.zeros((4,), np.float32)},
                   "head": {"kernel": np.ones((1, 1, 4, 1), np.float32)}},
        "batch_stats": {"bn1": {"mean": np.full((4,), 2.5, np.float32),
                                "var": np.full((4,), 0.25, np.float32)}},
    }
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables, variant="nano", step="12000")
    loaded, meta = load_variables_npz(path)

    assert meta == {"variant": "nano", "step": "12000"}
    assert set(loaded) == {"params", "batch_stats"}
    np.testing.assert_array_equal(loaded["params"]["conv1"]["kernel"],
                                  variables["params"]["conv1"]["kernel"])
    np.testing.assert_array_equal(loaded["batch_stats"]["bn1"]["var"],
                                  variables["batch_stats"]["bn1"]["var"])


def test_npz_loaded_tree_drives_turbo_predictor(tmp_path):
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer.predictor import TurboPredictor
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    variant = TurboVariant.nano()
    model = TurboDepthNet(variant, dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x0)

    path = str(tmp_path / "nano.npz")
    save_variables_npz(path, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})
    loaded, _ = load_variables_npz(path)

    pred = TurboPredictor(loaded["params"], loaded["batch_stats"], variant=variant,
                          height=64, width=96, batch_size=2, dtype=jnp.float32)
    out = pred.predict_array(np.zeros((2, 64, 96, 3), np.float32))
    assert out.shape == (2, 64, 96)
    assert np.isfinite(out).all()


def test_infer_cli_weights_npz(tmp_path):
    """infer.cli --weights serves a committed-format .npz end to end (turbo mode);
    the npz 'variant' metadata selects the architecture."""
    jax = pytest.importorskip("jax")
    import os

    import jax.numpy as jnp
    from PIL import Image

    from tf_depth_estimation_tpu.infer import cli as infer_cli
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    variant = TurboVariant.nano()
    model = TurboDepthNet(variant, dtype=jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32))
    path = str(tmp_path / "nano.npz")
    save_variables_npz(path, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]},
                       variant="nano")

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            frames / f"f{i}.jpg")

    out_dir = str(tmp_path / "out")
    written = infer_cli.main([
        "--dataset_dir", str(frames), "--output_dir", out_dir,
        "--weights", path, "--mode", "turbo", "--turbo_variant", "base",
        "--image_height", "64", "--image_width", "96",
        "--out_height", "32", "--out_width", "48", "--batch_size", "2",
        "--dtype", "float32", "--no_bilateral",
    ])
    assert len(written) == 3
    z = np.fromfile(written[0], np.float32)
    assert z.size == 32 * 48 and np.isfinite(z).all()
    assert os.path.exists(written[2])


def test_committed_weights_load_and_match_their_variant():
    """Every .npz under weights/ decodes, carries variant metadata matching its
    filename, and its params initialize the advertised architecture (shape-level
    guard against corrupt or mislabeled committed weights)."""
    import os

    import jax

    from tf_depth_estimation_tpu.models import (
        DispNet,
        DispNetVariant,
        TurboDepthNet,
        TurboVariant,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "weights")
    files = sorted(f for f in os.listdir(root) if f.endswith(".npz"))
    assert files, "no committed weights found"
    for name in files:
        loaded, meta = load_variables_npz(os.path.join(root, name))
        assert set(loaded) >= {"params", "batch_stats"}, name
        if name.startswith("turbo_"):
            variant_name = name.split("_")[1]
            assert meta.get("variant") == variant_name, (name, meta)
            model = TurboDepthNet(TurboVariant.by_name(variant_name))
        else:
            assert name.startswith("depth4_"), name
            model = DispNet(DispNetVariant.depth4())
        import jax.numpy as jnp

        ref = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 96, 3), jnp.float32),
                                   train=False))
        got_shapes = jax.tree.map(lambda x: x.shape, loaded["params"])
        ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
        assert got_shapes == ref_shapes, f"{name}: params shapes diverge"


def test_npz_empty_collection_roundtrip(tmp_path):
    """A BN-free model's batch_stats is {}; the loader must give it back as {}
    (not KeyError far from the cause) — ADVICE r4."""
    variables = {"params": {"w": np.ones((2, 2), np.float32)}, "batch_stats": {}}
    path = str(tmp_path / "nobn.npz")
    save_variables_npz(path, variables)
    loaded, _ = load_variables_npz(path)
    assert loaded["batch_stats"] == {}
    np.testing.assert_array_equal(loaded["params"]["w"], variables["params"]["w"])


def test_npz_rejects_non_float_leaves(tmp_path):
    with pytest.raises(TypeError, match="non-float"):
        save_variables_npz(str(tmp_path / "bad.npz"),
                           {"params": {"step": np.asarray(3, np.int32)}})


def test_templateless_restore_and_group_narrowing(tmp_path):
    """CheckpointManager.restore() without a template (the export/eval tools'
    path) and restore_group's narrowed partial restore — ADVICE r4: these had no
    CPU coverage, so an orbax bump could silently break the tools."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager

    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d)
    tree = {
        "model": {"step": jnp.asarray(7),
                  "params": {"w": jnp.arange(6.0).reshape(2, 3)},
                  "batch_stats": {}},
        "opt": {"m": jnp.full((2, 3), 0.5)},
    }
    mgr.save(7, tree)

    full = mgr.restore()  # templateless, whole tree
    assert set(full) == {"model", "opt"}
    np.testing.assert_allclose(np.asarray(full["model"]["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))

    group = mgr.restore_group("model")  # templateless, narrowed
    assert set(group) >= {"step", "params"}
    assert int(group["step"]) == 7
    np.testing.assert_allclose(np.asarray(group["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    with pytest.raises(KeyError, match="nonexistent"):
        mgr.restore(only_group="nonexistent")


def test_infer_cli_weights_variant_mismatch_errors(tmp_path):
    """A turbo .npz whose params don't match the constructed variant must fail
    fast with a clear message naming the file — ADVICE r4 (previously an opaque
    shape error inside the jitted forward)."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.infer import cli as infer_cli
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    model = TurboDepthNet(TurboVariant.nano(), dtype=jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32))
    path = str(tmp_path / "unlabeled.npz")  # no 'variant' metadata on purpose
    save_variables_npz(path, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})
    frames = tmp_path / "frames"
    frames.mkdir()
    with pytest.raises(SystemExit, match="does not match"):
        infer_cli.main([
            "--dataset_dir", str(frames), "--output_dir", str(tmp_path / "o"),
            "--weights", path, "--mode", "turbo", "--turbo_variant", "base",
            "--image_height", "64", "--image_width", "96",
            "--dtype", "float32",
        ])
