"""Golden tests for the geometry core against independent NumPy oracles.

The oracles re-derive the reference semantics (utils_lr.py) from first principles in NumPy
— per SURVEY §4's test strategy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.geometry import (
    axis_angle_to_matrix,
    bilinear_sample,
    cam_to_pixel,
    euler_to_matrix,
    invert_transform,
    make_intrinsics_matrix,
    pad_intrinsics_4x4,
    pixel_grid,
    pixel_to_cam,
    pose_vec_to_mat,
    projective_inverse_warp,
    flow_warp,
    flow_from_coords,
    scale_intrinsics_pyramid,
)

rng = np.random.RandomState(0)


def np_rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def np_roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def np_rotx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def test_euler_to_matrix_matches_composition():
    z, y, x = rng.uniform(-3, 3, (3, 8)).astype(np.float32)
    R = np.array(euler_to_matrix(jnp.array(z), jnp.array(y), jnp.array(x)))
    for i in range(8):
        expected = np_rotx(x[i]) @ np_roty(y[i]) @ np_rotz(z[i])
        np.testing.assert_allclose(R[i], expected, atol=1e-5)


def test_axis_angle_rodrigues():
    axis = rng.randn(6, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(-np.pi, np.pi, 6).astype(np.float32)
    R = np.array(axis_angle_to_matrix(jnp.array(axis), jnp.array(angle)))
    for i in range(6):
        K = np.array(
            [
                [0, -axis[i, 2], axis[i, 1]],
                [axis[i, 2], 0, -axis[i, 0]],
                [-axis[i, 1], axis[i, 0], 0],
            ]
        )
        expected = np.eye(3) + np.sin(angle[i]) * K + (1 - np.cos(angle[i])) * K @ K
        np.testing.assert_allclose(R[i], expected, atol=1e-5)
        # orthonormality
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)


def test_pose_vec_to_mat_angleaxis_roundtrip():
    vec = rng.randn(4, 6).astype(np.float32) * 0.3
    T = np.array(pose_vec_to_mat(jnp.array(vec), "angleaxis"))
    assert T.shape == (4, 4, 4)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (4, 1)), atol=1e-7)
    np.testing.assert_allclose(T[:, :3, 3], vec[:, :3], atol=1e-6)
    # inverse is closed-form rigid inverse
    Tinv = np.array(invert_transform(jnp.array(T)))
    for i in range(4):
        np.testing.assert_allclose(Tinv[i] @ T[i], np.eye(4), atol=1e-5)


def test_pose_vec_zero_rotation_is_finite():
    vec = jnp.zeros((2, 6))
    T = pose_vec_to_mat(vec, "angleaxis")
    assert bool(jnp.all(jnp.isfinite(T)))
    np.testing.assert_allclose(np.array(T[0, :3, :3]), np.eye(3), atol=1e-5)
    # gradient also finite at zero rotation (fixes utils_lr.py:128-133 guardlessness)
    g = jax.grad(lambda v: jnp.sum(pose_vec_to_mat(v, "angleaxis")))(vec)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_pixel_grid_matches_reference_meshgrid():
    # reference meshgrid builds linspace(-1,1)->rescale to 0..W-1 (utils_lr.py:196-220)
    H, W = 5, 9
    g = np.array(pixel_grid(H, W))
    xs = (np.linspace(-1, 1, W) + 1) * 0.5 * (W - 1)
    ys = (np.linspace(-1, 1, H) + 1) * 0.5 * (H - 1)
    np.testing.assert_allclose(g[0], np.tile(xs, (H, 1)), atol=1e-5)
    np.testing.assert_allclose(g[1], np.tile(ys[:, None], (1, W)), atol=1e-5)
    np.testing.assert_allclose(g[2], np.ones((H, W)), atol=1e-7)


def test_pixel_to_cam_against_numpy():
    B, H, W = 2, 6, 8
    depth = rng.uniform(0.5, 3.0, (B, H, W)).astype(np.float32)
    K = np.array(
        make_intrinsics_matrix(
            np.full(B, 100.0, np.float32),
            np.full(B, 120.0, np.float32),
            np.full(B, 4.0, np.float32),
            np.full(B, 3.0, np.float32),
        )
    )
    cam = np.array(pixel_to_cam(jnp.array(depth), jnp.array(K)))
    grid = np.array(pixel_grid(H, W))
    for b in range(B):
        pts = np.linalg.inv(K[b]) @ grid.reshape(3, -1) * depth[b].reshape(1, -1)
        np.testing.assert_allclose(cam[b, :3].reshape(3, -1), pts, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(cam[b, 3], np.ones((H, W)), atol=1e-7)


def test_cam_to_pixel_identity_roundtrip():
    # project with K @ identity pose: should return the original pixel grid and z=depth
    B, H, W = 1, 7, 11
    depth = rng.uniform(1.0, 2.0, (B, H, W)).astype(np.float32)
    K = make_intrinsics_matrix([50.0], [60.0], [5.0], [3.0])
    cam = pixel_to_cam(jnp.array(depth), K)
    proj = pad_intrinsics_4x4(K)
    coords, z = cam_to_pixel(cam, proj)
    grid = np.array(pixel_grid(H, W, homogeneous=False))
    np.testing.assert_allclose(np.array(coords[0, ..., 0]), grid[0], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.array(coords[0, ..., 1]), grid[1], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.array(z[0, ..., 0]), depth[0], rtol=1e-5)


def np_bilinear_sampler(imgs, coords):
    """NumPy oracle reproducing utils_lr.py:276-366 exactly (incl. border weights)."""
    B, Hs, Ws, C = imgs.shape
    _, Ht, Wt, _ = coords.shape
    out = np.zeros((B, Ht, Wt, C), np.float32)
    wmask = np.zeros((B, Ht, Wt, 1), np.float32)
    for b in range(B):
        for i in range(Ht):
            for j in range(Wt):
                x, y = coords[b, i, j]
                x0, y0 = np.floor(x), np.floor(y)
                x1, y1 = x0 + 1, y0 + 1
                x0s = np.clip(x0, 0, Ws - 1)
                x1s = np.clip(x1, 0, Ws - 1)
                y0s = np.clip(y0, 0, Hs - 1)
                y1s = np.clip(y1, 0, Hs - 1)
                wx0 = (x1 - x) * (x0 == x0s)
                wx1 = (x - x0) * (x1 == x1s)
                wy0 = (y1 - y) * (y0 == y0s)
                wy1 = (y - y0) * (y1 == y1s)
                acc = (
                    wx0 * wy0 * imgs[b, int(y0s), int(x0s)]
                    + wx0 * wy1 * imgs[b, int(y1s), int(x0s)]
                    + wx1 * wy0 * imgs[b, int(y0s), int(x1s)]
                    + wx1 * wy1 * imgs[b, int(y1s), int(x1s)]
                )
                out[b, i, j] = acc
                wmask[b, i, j] = wx0 * wy0 + wx0 * wy1 + wx1 * wy0 + wx1 * wy1
    return out, wmask


def test_bilinear_sample_against_oracle():
    B, Hs, Ws, C = 2, 6, 7, 3
    imgs = rng.rand(B, Hs, Ws, C).astype(np.float32)
    # coords spanning inside, borderline, and far outside
    coords = rng.uniform(-3, max(Hs, Ws) + 3, (B, 5, 4, 2)).astype(np.float32)
    out, wmask = bilinear_sample(jnp.array(imgs), jnp.array(coords))
    exp_out, exp_w = np_bilinear_sampler(imgs, coords)
    np.testing.assert_allclose(np.array(out), exp_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(wmask), exp_w, rtol=1e-4, atol=1e-5)


def test_bilinear_sample_identity():
    imgs = rng.rand(1, 5, 6, 2).astype(np.float32)
    grid = np.array(pixel_grid(5, 6, homogeneous=False))
    coords = np.stack([grid[0], grid[1]], axis=-1)[None]
    out, wmask = bilinear_sample(jnp.array(imgs), jnp.array(coords))
    np.testing.assert_allclose(np.array(out), imgs, atol=1e-5)
    np.testing.assert_allclose(np.array(wmask), np.ones((1, 5, 6, 1)), atol=1e-5)


def test_projective_inverse_warp_identity_pose():
    """Identity pose + same-view warp must reproduce the image where valid."""
    B, H, W = 1, 8, 10
    img = rng.rand(B, H, W, 3).astype(np.float32)
    depth = np.full((B, H, W), 2.0, np.float32)
    K = make_intrinsics_matrix([40.0], [40.0], [W / 2.0], [H / 2.0])
    pose = jnp.zeros((B, 6))
    res = projective_inverse_warp(jnp.array(img), jnp.array(depth), pose, K, fmt="euler")
    np.testing.assert_allclose(np.array(res.image), img, atol=1e-4)
    np.testing.assert_allclose(np.array(res.warped_depth[..., 0]), depth, atol=1e-4)
    fx, fy = flow_from_coords(res.coords)
    np.testing.assert_allclose(np.array(fx), np.zeros((B, H, W, 1)), atol=1e-3)
    np.testing.assert_allclose(np.array(fy), np.zeros((B, H, W, 1)), atol=1e-3)


def test_projective_inverse_warp_pure_translation():
    """Translating the camera along +x by fx*dz/z pixels shifts sampling coords by known flow."""
    B, H, W = 1, 8, 10
    depth = np.full((B, H, W), 2.0, np.float32)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    fx = 40.0
    K = make_intrinsics_matrix([fx], [fx], [W / 2.0], [H / 2.0])
    tx = 0.1
    pose = jnp.array([[tx, 0, 0, 0, 0, 0]], dtype=jnp.float32)
    res = projective_inverse_warp(jnp.array(img), jnp.array(depth), pose, K, fmt="euler")
    # p_src = K (p_cam + t): x shift = fx * tx / z
    expected_shift = fx * tx / 2.0
    grid = np.array(pixel_grid(H, W, homogeneous=False))
    np.testing.assert_allclose(
        np.array(res.coords[0, ..., 0]), grid[0] + expected_shift, atol=1e-4
    )
    np.testing.assert_allclose(np.array(res.coords[0, ..., 1]), grid[1], atol=1e-4)


def test_flow_warp_shifts():
    img = np.zeros((1, 4, 6, 1), np.float32)
    img[0, :, 2, 0] = 1.0
    # flow of +1 in x samples from x+1 => image shifts left by 1
    fx = np.ones((1, 4, 6, 1), np.float32)
    fy = np.zeros((1, 4, 6, 1), np.float32)
    out = flow_warp(jnp.array(img), jnp.array(fx), jnp.array(fy))
    np.testing.assert_allclose(np.array(out[0, :, 1, 0]), np.ones(4), atol=1e-5)


def test_scale_intrinsics_pyramid():
    K = make_intrinsics_matrix([100.0], [200.0], [50.0], [25.0])
    pyr = np.array(scale_intrinsics_pyramid(K, 4))
    assert pyr.shape == (1, 4, 3, 3)
    for s in range(4):
        np.testing.assert_allclose(pyr[0, s, 0, 0], 100.0 / 2**s, rtol=1e-6)
        np.testing.assert_allclose(pyr[0, s, 1, 2], 25.0 / 2**s, rtol=1e-6)
        np.testing.assert_allclose(pyr[0, s, 2], [0, 0, 1], atol=1e-7)


def test_warp_is_differentiable():
    B, H, W = 1, 6, 6
    img = jnp.array(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.array(rng.uniform(1, 3, (B, H, W)).astype(np.float32))
    K = make_intrinsics_matrix([20.0], [20.0], [3.0], [3.0])
    pose = jnp.array([[0.05, 0.02, -0.01, 0.01, -0.02, 0.03]])

    def loss(d, p):
        res = projective_inverse_warp(img, d, p, K, fmt="angleaxis")
        return jnp.mean(jnp.abs(res.image - img) * res.mask)

    gd, gp = jax.grad(loss, argnums=(0, 1))(depth, pose)
    assert bool(jnp.all(jnp.isfinite(gd))) and bool(jnp.all(jnp.isfinite(gp)))
    assert float(jnp.max(jnp.abs(gp))) > 0
