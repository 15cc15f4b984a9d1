import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import epnp, ransac, se3, stereo, triangulation

# KITTI-like calibration: fx fy cx cy baseline
CALIB = jnp.array([718.856, 718.856, 607.1928, 185.2157, 0.5372], jnp.float32)


def synthetic_scene(key, n=128, depth_range=(4.0, 60.0)):
    """Random world points in front of a camera at a random pose."""
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jnp.concatenate(
        [jax.random.normal(k1, (3,)) * 0.1, jax.random.normal(k2, (3,)) * 2.0]
    )
    T_w2c = se3.se3_exp(xi)
    # sample points in camera frame then pull back to world
    u = jax.random.uniform(k3, (n, 3))
    pc = jnp.stack(
        [
            (u[:, 0] - 0.5) * 30.0,
            (u[:, 1] - 0.5) * 10.0,
            depth_range[0] + u[:, 2] * (depth_range[1] - depth_range[0]),
        ],
        axis=-1,
    )
    pw = se3.transform_points(se3.inverse(T_w2c), pc)
    return T_w2c, pw, pc


def test_stereo_project_backproject_roundtrip():
    key = jax.random.PRNGKey(0)
    _, _, pc = synthetic_scene(key)
    meas = stereo.project(CALIB, pc)
    pc2 = stereo.backproject(CALIB, meas)
    np.testing.assert_allclose(np.asarray(pc2), np.asarray(pc), rtol=1e-3, atol=1e-2)


def test_stereo_disparity_positive():
    key = jax.random.PRNGKey(1)
    _, _, pc = synthetic_scene(key)
    meas = stereo.project(CALIB, pc)
    # rectified stereo invariant: uL > uR for positive depth (ref matching.py:62-63)
    assert bool(jnp.all(meas[:, 0] > meas[:, 1]))


def test_triangulate_dlt_recovers_points():
    key = jax.random.PRNGKey(2)
    T_w2c, pw, pc = synthetic_scene(key, n=64)
    K = stereo.K_from_calib(CALIB)
    P, Q = stereo.projection_matrices(K, T_w2c, float(CALIB[4]))
    meas = stereo.project(CALIB, pc)  # (uL, uR, v) in this camera
    pts_l = jnp.stack([meas[:, 0], meas[:, 2]], axis=-1)
    pts_r = jnp.stack([meas[:, 1], meas[:, 2]], axis=-1)
    Xw = triangulation.triangulate(P, Q, pts_l, pts_r)
    # f32 DLT at up-to-60m depth: allow 2% relative error
    np.testing.assert_allclose(np.asarray(Xw), np.asarray(pw), rtol=2e-2, atol=0.1)


def test_triangulate_rectified_matches_dlt():
    key = jax.random.PRNGKey(3)
    _, _, pc = synthetic_scene(key, n=64)
    meas = stereo.project(CALIB, pc)
    pc_closed = triangulation.triangulate_rectified(CALIB, meas)
    np.testing.assert_allclose(np.asarray(pc_closed), np.asarray(pc), rtol=1e-3, atol=1e-2)


def test_epnp_exact_correspondences():
    key = jax.random.PRNGKey(4)
    T_w2c, pw, pc = synthetic_scene(key, n=16)
    pix = stereo.monocular_project(CALIB, pc)
    T_est, ok = epnp.solve_pnp_epnp(pw, pix, CALIB)
    assert bool(ok)
    # compare via reprojection, the metric that matters
    pix2 = stereo.monocular_project(CALIB, se3.transform_points(T_est, pw))
    err = jnp.max(jnp.linalg.norm(pix2 - pix, axis=-1))
    assert float(err) < 0.5


def test_epnp_six_points():
    # n >= 6 is EPnP's generic regime (minimal RANSAC sets use rigid_align)
    key = jax.random.PRNGKey(5)
    T_w2c, pw, pc = synthetic_scene(key, n=6)
    pix = stereo.monocular_project(CALIB, pc)
    T_est, ok = epnp.solve_pnp_epnp(pw, pix, CALIB)
    assert bool(ok)
    pix2 = stereo.monocular_project(CALIB, se3.transform_points(T_est, pw))
    err = jnp.max(jnp.linalg.norm(pix2 - pix, axis=-1))
    assert float(err) < 2.0


def test_rigid_align_exact():
    key = jax.random.PRNGKey(12)
    T_w2c, pw, pc = synthetic_scene(key, n=3)
    T_est, ok = epnp.rigid_align(pw, pc)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T_w2c), atol=1e-3)


def test_rigid_align_degenerate_collinear():
    pa = jnp.stack([jnp.arange(3.0), jnp.zeros(3), jnp.zeros(3)], axis=-1)
    _, ok = epnp.rigid_align(pa, pa + 1.0)
    assert not bool(ok)


def test_refine_pose_gn_improves():
    key = jax.random.PRNGKey(6)
    T_w2c, pw, pc = synthetic_scene(key, n=64)
    meas = stereo.project(CALIB, pc)
    # perturb the pose and refine back
    T0 = se3.retract(T_w2c, jnp.array([0.01, -0.02, 0.015, 0.2, -0.1, 0.3]))
    w = jnp.ones(64, jnp.float32)
    T_ref = epnp.refine_pose_gn(T0, pw, meas, w, CALIB, iters=10)
    err0 = jnp.linalg.norm(se3.local(T_w2c, T0))
    err1 = jnp.linalg.norm(se3.local(T_w2c, T_ref))
    assert float(err1) < float(err0) * 0.01


def test_ransac_pnp_with_outliers():
    key = jax.random.PRNGKey(7)
    T_w2c, pw, pc = synthetic_scene(key, n=256)
    meas = stereo.project(CALIB, pc)
    # corrupt 40% of measurements
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    outlier = jax.random.uniform(k1, (256,)) < 0.4
    noise = jax.random.uniform(k2, (256, 3)) * 200.0 - 100.0
    meas_noisy = jnp.where(outlier[:, None], meas + noise, meas)
    valid = jnp.ones(256, bool)

    out = ransac.ransac_pnp(
        jax.random.PRNGKey(9), pw, meas_noisy, valid, CALIB, num_hypotheses=256
    )
    assert bool(out["ok"])
    # recovered pose within tight tolerance
    dxi = se3.local(T_w2c, out["T_w2c"])
    assert float(jnp.linalg.norm(dxi[:3])) < 1e-3  # rotation (rad)
    assert float(jnp.linalg.norm(dxi[3:])) < 0.05  # translation (m)
    # inliers mostly the uncorrupted ones
    inl = np.asarray(out["inliers"])
    assert inl[~np.asarray(outlier)].mean() > 0.95
    assert inl[np.asarray(outlier)].mean() < 0.1


def test_ransac_pnp_respects_padding():
    key = jax.random.PRNGKey(10)
    T_w2c, pw, pc = synthetic_scene(key, n=64)
    meas = stereo.project(CALIB, pc)
    # pad to 128 with garbage
    pad = 64
    pw_p = jnp.concatenate([pw, jnp.zeros((pad, 3))], axis=0)
    meas_p = jnp.concatenate([meas, jnp.full((pad, 3), 1e6)], axis=0)
    valid = jnp.concatenate([jnp.ones(64, bool), jnp.zeros(pad, bool)])
    out = ransac.ransac_pnp(
        jax.random.PRNGKey(11), pw_p, meas_p, valid, CALIB, num_hypotheses=128
    )
    assert bool(out["ok"])
    assert not bool(jnp.any(out["inliers"][64:]))
    dxi = se3.local(T_w2c, out["T_w2c"])
    assert float(jnp.linalg.norm(dxi)) < 0.05
