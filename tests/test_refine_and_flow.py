"""Coverage for the flow-augmented predictor and the COLMAP-driven refine CLI."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

rng = np.random.RandomState(23)
H, W = 32, 48


def test_flow_augmented_predictor():
    from tf_depth_estimation_tpu.infer import FlowAugmentedPredictor
    from tf_depth_estimation_tpu.models import DepthPoseNet

    model = DepthPoseNet(full_resolution=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 11)), train=True)
    pred = FlowAugmentedPredictor(variables["params"], variables.get("batch_stats"),
                                  height=H, width=W, batch_size=2, dtype=jnp.float32)
    I = rng.rand(H, W, 3).astype(np.float32) * 255
    I1 = rng.rand(H, W, 3).astype(np.float32) * 255
    flow = rng.uniform(-2, 2, (H, W, 2)).astype(np.float32)
    inp = pred.assemble_input(I, I1, flow)
    assert inp.shape == (H, W, 11)
    out = pred.predict(np.stack([inp, inp, inp]))  # 3 frames, batch 2 -> padding path
    assert out.shape[0] == 3 and np.isfinite(out).all() and (out > 0).all()


@pytest.fixture()
def colmap_scene(tmp_path):
    """Tiny two-view COLMAP text model + matching images on disk."""
    import cv2

    d = tmp_path / "sparse"
    d.mkdir()
    imgs = tmp_path / "images"
    imgs.mkdir()
    fx = 40.0
    with open(d / "cameras.txt", "w") as f:
        f.write(f"1 PINHOLE {W} {H} {fx} {fx} {W/2} {H/2}\n")
    with open(d / "images.txt", "w") as f:
        f.write("1 1 0 0 0 0 0 0 1 a.jpg\n")
        f.write("20.0 12.0 1 30.0 20.0 2\n")
        f.write("2 1 0 0 0 -0.2 0 0 1 b.jpg\n")
        f.write("21.0 12.0 1 31.0 20.0 2\n")
    with open(d / "points3D.txt", "w") as f:
        f.write("1 0.1 0.2 2.0 255 0 0 0.5 1 0 2 0\n")
        f.write("2 -0.2 0.3 2.5 0 255 0 0.5 1 1 2 1\n")
    for name in ("a.jpg", "b.jpg"):
        cv2.imwrite(str(imgs / name), (rng.rand(H, W, 3) * 255).astype(np.uint8))
    return str(d), str(imgs)


def test_refine_cli_end_to_end(colmap_scene, tmp_path):
    from tf_depth_estimation_tpu.infer import refine_cli

    model_dir, image_dir = colmap_scene
    depth, hist = refine_cli.main([
        "--model_dir", model_dir, "--image_dir", image_dir,
        "--image1", "a.jpg", "--image2", "b.jpg",
        "--output_dir", str(tmp_path / "out"),
        "--steps", "2", "--height", str(H), "--width", str(W),
    ])
    assert depth.shape == (H, W) and np.isfinite(depth).all()
    out = str(tmp_path / "out" / "a.jpg_refined_z.bin")
    assert os.path.exists(out)
    z = np.fromfile(out, np.float32)
    assert z.size == H * W
