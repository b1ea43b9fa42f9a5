"""Tests: batched predictors (output contracts vs batch_prediction*), COLMAP parsing,
3D/flow I/O, and the sampler oracle cross-check."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.colmap import (
    SceneManager,
    axis_angle_to_matrix_np,
    bilinear_interpolate,
    matrix_to_axis_angle_np,
    normals_from_depth,
    quaternion_to_matrix,
    read_flow,
    write_ply_points,
    write_ply_surface,
)
from tf_depth_estimation_tpu.infer import DepthPredictor, PairPredictor
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant

rng = np.random.RandomState(11)


# ---------- predictors ----------
@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("frames")
    for i in range(3):
        img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"f{i:03d}.jpg"), img)
    return str(d)


def test_depth_predictor_directory(frames_dir, tmp_path):
    H = W = 32
    model = DispNet(DispNetVariant.depth4())
    import jax

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=True)
    pred = DepthPredictor(variables["params"], variables.get("batch_stats"),
                          height=H, width=W, batch_size=2, dtype=jnp.float32)
    written = pred.predict_directory(frames_dir, str(tmp_path / "out"),
                                     out_height=20, out_width=30)
    assert len(written) == 3
    z = np.fromfile(written[0], dtype=np.float32)
    assert z.size == 20 * 30
    assert np.isfinite(z).all() and (z > 0).all()  # sigmoid*4 disparity


def test_pair_predictor_writes_pose(frames_dir, tmp_path):
    H = W = 32
    model = DepthPoseNet(full_resolution=False)
    import jax

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)), train=True)
    pred = PairPredictor(variables["params"], variables.get("batch_stats"),
                         height=H, width=W, batch_size=2, dtype=jnp.float32)
    written = pred.predict_directory(frames_dir, str(tmp_path / "out"),
                                     out_height=20, out_width=30)
    assert len(written) == 2  # N-1 consecutive pairs
    pose = np.loadtxt(os.path.join(frames_dir, "f000.jpg.txt"))
    assert pose.shape == (6,)


# ---------- colmap ----------
@pytest.fixture(scope="module")
def colmap_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("colmap")
    with open(d / "cameras.txt", "w") as f:
        f.write("# cameras\n1 PINHOLE 64 48 50.0 50.0 32.0 24.0\n")
    # two images looking at points from different positions
    with open(d / "images.txt", "w") as f:
        f.write("# images\n")
        f.write("1 1 0 0 0 0 0 0 1 a.jpg\n")
        f.write("10.0 12.0 1 20.0 22.0 2 5.0 5.0 -1\n")
        f.write("2 1 0 0 0 -0.5 0 0 1 b.jpg\n")
        f.write("11.0 12.0 1 21.0 22.0 2\n")
    with open(d / "points3D.txt", "w") as f:
        f.write("# points\n")
        f.write("1 0.1 0.2 2.0 255 0 0 0.5 1 0 2 0\n")
        f.write("2 -0.3 0.1 3.0 0 255 0 5.0 1 1 2 1\n")
    return str(d)


def test_scene_manager_load_and_queries(colmap_model):
    sm = SceneManager(colmap_model).load()
    assert len(sm.cameras) == 1 and len(sm.images) == 2
    assert sm.points3D.shape == (2, 3)
    pts, obs = sm.get_points3D(1)
    assert pts.shape == (2, 3) and obs.shape == (2, 2)
    viewed = sm.get_viewed_points(1)
    assert len(viewed) == 2  # both points project inside the 64x48 frustum
    keep = sm.filter_points3D(min_track_len=2, max_error=2.0, min_tri_angle_deg=0.5)
    # point 2 has error 5.0 > 2.0 -> filtered
    assert keep[0] and not keep[1]


def test_quaternion_and_axis_angle_roundtrip():
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = quaternion_to_matrix(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    axis, angle = matrix_to_axis_angle_np(R)
    R2 = axis_angle_to_matrix_np(axis, angle)
    np.testing.assert_allclose(R, R2, atol=1e-8)


def test_read_flow_roundtrip(tmp_path):
    flo = rng.rand(6, 8, 2).astype(np.float32)
    path = str(tmp_path / "t.flo")
    with open(path, "wb") as f:
        np.array([202021.25], np.float32).tofile(f)
        np.array([8, 6], np.int32).tofile(f)
        flo.tofile(f)
    out = read_flow(path)
    np.testing.assert_allclose(out, flo)


def test_bilinear_interpolate_matches_device_sampler():
    """The reference's own NumPy sampler is the oracle for interior points
    (border semantics differ: util.py clamps weights, utils_lr.py zeroes them)."""
    from tf_depth_estimation_tpu.geometry import bilinear_sample

    im = rng.rand(7, 9, 2).astype(np.float32)
    xs = rng.uniform(0, 7.9, (4, 5)).astype(np.float32)
    ys = rng.uniform(0, 5.9, (4, 5)).astype(np.float32)
    a = bilinear_interpolate(im, xs, ys)
    coords = np.stack([xs, ys], axis=-1)[None]
    b, _ = bilinear_sample(jnp.array(im)[None], jnp.array(coords))
    np.testing.assert_allclose(a, np.array(b[0]), rtol=1e-4, atol=1e-5)


def test_ply_writers_and_normals(tmp_path):
    pts = rng.rand(10, 3)
    write_ply_points(str(tmp_path / "p.ply"), pts, (pts * 255).astype(np.uint8))
    txt = open(tmp_path / "p.ply").read()
    assert "element vertex 10" in txt

    depth = np.full((8, 10), 2.0)
    K = np.array([[40.0, 0, 5], [0, 40.0, 4], [0, 0, 1]])
    write_ply_surface(str(tmp_path / "s.ply"), depth, K)
    txt = open(tmp_path / "s.ply").read()
    assert "element face" in txt
    n = normals_from_depth(depth, K)
    # constant-depth plane faces the camera: normal = (0, 0, ±1)
    np.testing.assert_allclose(np.abs(n[2:-2, 2:-2, 2]), 1.0, atol=1e-6)


def test_refine_depth_smoke():
    from tf_depth_estimation_tpu.infer.refine import refine_depth

    H, W = 32, 48
    img1 = rng.rand(H, W, 3).astype(np.float32)
    img2 = rng.rand(H, W, 3).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    sxy = rng.uniform(0, min(H, W) - 1, (20, 2)).astype(np.float32)
    sz = rng.uniform(1.0, 2.0, 20).astype(np.float32)
    depth, hist = refine_depth(img1, img2, pose, K, sxy, sz, steps=4, num_scales=2)
    assert depth.shape == (H, W)
    assert np.isfinite(depth).all()
    # sparse scale alignment holds at the end
    med = np.median(depth[np.clip(sxy[:, 1].astype(int), 0, H - 1),
                          np.clip(sxy[:, 0].astype(int), 0, W - 1)])
    np.testing.assert_allclose(med, np.median(sz), rtol=0.05)
