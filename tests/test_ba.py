"""Bundle-adjustment solver tests: golden validation against dense
linear algebra on tiny problems (SURVEY.md §7.3 mitigation)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import ba, se3, stereo

CALIB = jnp.array([700.0, 700.0, 320.0, 180.0, 0.54], jnp.float32)


def make_problem(key, P=4, L=40, noise_px=0.3, pose_err=0.02, point_err=0.2):
    """Ground-truth window + perturbed initialization."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # poses: forward motion, window frame = camera 0
    t = jnp.arange(P, dtype=jnp.float32)
    xi = jnp.stack(
        [
            jnp.zeros_like(t),
            0.02 * t,
            jnp.zeros_like(t),
            0.1 * t,
            jnp.zeros_like(t),
            -1.0 * t,
        ],
        axis=-1,
    )  # camera moves +z in window frame => points move -z in cam frame
    poses_gt = jax.vmap(se3.se3_exp)(xi)

    u = jax.random.uniform(k1, (L, 3))
    points_gt = jnp.stack(
        [
            (u[:, 0] - 0.5) * 20.0,
            (u[:, 1] - 0.5) * 6.0,
            8.0 + u[:, 2] * 30.0,
        ],
        axis=-1,
    )

    # observations: every pose sees every landmark (M = P*L)
    cam_idx = jnp.repeat(jnp.arange(P), L)
    lm_idx = jnp.tile(jnp.arange(L), P)
    T = poses_gt[cam_idx]
    Xc = jnp.einsum("mij,mj->mi", T[:, :3, :3], points_gt[lm_idx]) + T[:, :3, 3]
    meas = stereo.project(CALIB, Xc) + noise_px * jax.random.normal(k2, (P * L, 3))
    w = jnp.ones(P * L, jnp.float32)

    # perturbed init (pose 0 stays identity = gauge)
    dpose = pose_err * jax.random.normal(k3, (P, 6))
    dpose = dpose.at[0].set(0.0)
    poses0 = jax.vmap(se3.retract)(poses_gt, dpose)
    points0 = points_gt + point_err * jax.random.normal(k4, (L, 3))
    return poses_gt, points_gt, poses0, points0, cam_idx, lm_idx, meas, w


def test_lm_converges_to_ground_truth():
    key = jax.random.PRNGKey(0)
    poses_gt, points_gt, poses0, points0, ci, li, meas, w = make_problem(
        key, noise_px=0.0
    )
    poses, points, cost, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas, w, CALIB, iters=15
    )
    assert float(cost) < 1e-3
    for p in range(4):
        dxi = se3.local(poses_gt[p], poses[p])
        assert float(jnp.linalg.norm(dxi)) < 1e-3, (p, dxi)
    assert float(jnp.max(jnp.linalg.norm(points - points_gt, axis=-1))) < 0.01


def test_lm_reduces_cost_with_noise():
    key = jax.random.PRNGKey(1)
    _, _, poses0, points0, ci, li, meas, w = make_problem(key, noise_px=0.5)
    c0 = float(ba._cost(poses0, points0, ci, li, meas, w, CALIB))
    poses, points, cost, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas, w, CALIB, iters=15
    )
    assert float(cost) < 0.5 * c0


def test_padding_is_inert():
    """Padded observations (w=0) and padded landmarks must not change the
    solution."""
    key = jax.random.PRNGKey(2)
    poses_gt, _, poses0, points0, ci, li, meas, w = make_problem(key, noise_px=0.1)
    posesA, pointsA, costA, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas, w, CALIB, iters=10
    )
    # add garbage padding
    pad_obs = 37
    ci_p = jnp.concatenate([ci, jnp.zeros(pad_obs, jnp.int32)])
    li_p = jnp.concatenate([li, jnp.full(pad_obs, 40 + 3, jnp.int32)])
    meas_p = jnp.concatenate([meas, jnp.full((pad_obs, 3), 777.0)])
    w_p = jnp.concatenate([w, jnp.zeros(pad_obs)])
    points0_p = jnp.concatenate([points0, jnp.ones((8, 3)) * 5.0])
    posesB, pointsB, costB, _ = ba.optimize_bundle(
        poses0, points0_p, ci_p, li_p, meas_p, w_p, CALIB, iters=10
    )
    np.testing.assert_allclose(np.asarray(posesB), np.asarray(posesA), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pointsB[:40]), np.asarray(pointsA), atol=2e-3
    )
    assert abs(float(costB) - float(costA)) < 1e-2 * max(1.0, float(costA))


def _dense_gn_covariance(poses, points, ci, li, meas, w, calib, P, L):
    """Brute-force marginal covariances via one dense Hessian inverse."""

    def r_of(delta):
        dp = delta[: P * 6].reshape(P, 6)
        dp = dp.at[0].set(0.0)  # gauge
        dl = delta[P * 6 :].reshape(L, 3)
        pz = jax.vmap(se3.retract)(poses, dp)
        xz = points + dl
        r, _ = ba._residuals(pz, xz, ci, li, meas, w, calib)
        return r.reshape(-1)

    n = P * 6 + L * 3
    J = jax.jacfwd(r_of)(jnp.zeros(n))
    H = J.T @ J
    # fix gauge rows/cols
    m = np.ones(n)
    m[:6] = 0.0
    H = H * m[:, None] * m[None, :] + np.diag(1.0 - m)
    H = H + 1e-8 * np.eye(n)
    cov = np.linalg.inv(np.asarray(H))
    return cov


def test_covariance_matches_dense_inverse():
    """Golden test: Schur-based marginals == dense full-Hessian inverse."""
    key = jax.random.PRNGKey(3)
    P, L = 3, 12
    poses_gt, points_gt, poses0, points0, ci, li, meas, w = make_problem(
        key, P=P, L=L, noise_px=0.2
    )
    poses, points, cost, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas, w, CALIB, iters=10
    )
    cov_schur = np.asarray(
        ba.pose_covariances(poses, points, ci, li, meas, w, CALIB)
    )
    cov_dense = _dense_gn_covariance(poses, points, ci, li, meas, w, CALIB, P, L)
    for p in range(1, P):
        blk = cov_dense[p * 6 : (p + 1) * 6, p * 6 : (p + 1) * 6]
        np.testing.assert_allclose(cov_schur[p], blk, rtol=2e-2, atol=1e-8)
    # covariance must grow along the chain (less anchored)
    assert np.trace(cov_schur[2]) > np.trace(cov_schur[1])
    # gauge block is zero
    assert np.abs(cov_schur[0]).max() == 0.0


def test_huber_resists_outlier_measurements():
    """With gross measurement outliers, Huber BA stays near truth while
    Gaussian BA gets dragged."""
    key = jax.random.PRNGKey(7)
    poses_gt, points_gt, poses0, points0, ci, li, meas, w = make_problem(
        key, noise_px=0.2
    )
    # corrupt 10% of measurements badly
    k = jax.random.PRNGKey(8)
    bad = jax.random.uniform(k, (meas.shape[0],)) < 0.1
    meas_bad = jnp.where(bad[:, None], meas + 80.0, meas)

    posesG, _, _, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas_bad, w, CALIB, iters=15
    )
    posesH, _, _, _ = ba.optimize_bundle(
        poses0, points0, ci, li, meas_bad, w, CALIB, iters=15,
        huber_delta=2.0,
    )

    def pose_err(p):
        return float(sum(
            jnp.linalg.norm(se3.local(poses_gt[i], p[i])) for i in range(4)
        ))

    eG, eH = pose_err(posesG), pose_err(posesH)
    assert eH < 0.5 * eG, (eG, eH)


def test_depth_pruning_kills_bad_landmarks():
    key = jax.random.PRNGKey(4)
    poses_gt, points_gt, poses0, points0, ci, li, meas, w = make_problem(key)
    # landmark 0 behind the camera
    points_bad = points0.at[0].set(jnp.array([0.0, 0.0, -5.0]))
    w2 = ba.prune_depth_weights(poses0, points_bad, ci, li, w)
    dropped = np.asarray(li)[np.asarray(w2) == 0.0]
    assert set(dropped.tolist()) == {0}
    # landmark too far
    points_far = points0.at[1].set(jnp.array([0.0, 0.0, 5000.0]))
    w3 = ba.prune_depth_weights(poses0, points_far, ci, li, w)
    dropped = set(np.asarray(li)[np.asarray(w3) == 0.0].tolist())
    assert 1 in dropped


def test_engines_agree_including_bf16():
    """The three Schur-block engines must land on the same optimum.

    scatter vs onehot are bit-for-bit-grade equivalent (both f32); the
    bf16 engine perturbs only the Hessian (f32 gradient — inexact Newton,
    see ba._build_blocks_onehot_bf16), so its final cost must match to
    well under the measurement noise floor and its poses to sub-mm."""
    key = jax.random.PRNGKey(7)
    poses_gt, points_gt, poses0, points0, ci, li, meas, w = make_problem(
        key, P=6, L=64, noise_px=0.3
    )
    outs = {
        eng: ba.optimize_bundle(
            poses0, points0, ci, li, meas, w, CALIB, iters=20, engine=eng
        )
        for eng in ("scatter", "onehot", "onehot_b3", "onehot_bf16")
    }
    c_sc = float(outs["scatter"][2])
    c_oh = float(outs["onehot"][2])
    c_b3 = float(outs["onehot_b3"][2])
    c_bf = float(outs["onehot_bf16"][2])
    assert abs(c_oh - c_sc) < 1e-3 * c_sc
    assert abs(c_b3 - c_sc) < 2e-3 * c_sc, (c_b3, c_sc)
    assert abs(c_bf - c_sc) < 5e-3 * c_sc, (c_bf, c_sc)
    for p in range(6):
        d = se3.local(outs["scatter"][0][p], outs["onehot_bf16"][0][p])
        assert float(jnp.linalg.norm(d)) < 1e-3, (p, d)
    # landmarks: weakly constrained far points may settle anywhere in the
    # flat cost valley (0.3 px noise -> tens of cm of depth ambiguity at
    # 38 m), so compare each engine's ACCURACY against ground truth
    # rather than point-for-point identity
    err_sc = float(jnp.mean(jnp.linalg.norm(
        outs["scatter"][1] - points_gt, axis=-1)))
    err_bf = float(jnp.mean(jnp.linalg.norm(
        outs["onehot_bf16"][1] - points_gt, axis=-1)))
    assert err_bf < err_sc + 0.01, (err_bf, err_sc)
