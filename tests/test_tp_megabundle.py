"""Tensor-parallel (sharded-Schur) mega-bundle vs the single-device solver.

SURVEY.md §2.4's optional TP row: one bundle whose landmark/observation
axes are sharded over the mesh (parallel/tp_megabundle.py). The sharded
LM must reproduce the single-device ops/ba.py trajectory on the same
problem — the Schur sum decomposition is exact, so agreement is limited
only by f32 reduction-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import ba, se3, stereo
from slam_tpu.parallel import mesh as mesh_lib
from slam_tpu.parallel.tp_megabundle import (
    optimize_megabundle,
    partition_megabundle,
)

CALIB = jnp.array([718.856, 718.856, 607.1928, 185.2157, 0.5372],
                  jnp.float32)


def make_megaproblem(key, P=8, L=520, obs_per_lm=5, noise_px=0.3):
    """A window large enough that every device holds a real shard.

    L deliberately NOT a multiple of 8 (landmark padding must be inert).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    t = jnp.arange(P, dtype=jnp.float32)
    xi = jnp.stack([jnp.zeros_like(t), 0.02 * t, jnp.zeros_like(t),
                    0.1 * t, jnp.zeros_like(t), -0.9 * t], axis=-1)
    poses_gt = jax.vmap(se3.se3_exp)(xi)
    u = jax.random.uniform(k1, (L, 3))
    points_gt = jnp.stack([(u[:, 0] - 0.5) * 24.0, (u[:, 1] - 0.5) * 6.0,
                           8.0 + u[:, 2] * 40.0], axis=-1)
    M = L * obs_per_lm
    lm_idx = jnp.repeat(jnp.arange(L), obs_per_lm)
    cam_idx = jax.random.randint(k2, (M,), 0, P)
    T = poses_gt[cam_idx]
    Xc = jnp.einsum("mij,mj->mi", T[:, :3, :3], points_gt[lm_idx]) \
        + T[:, :3, 3]
    meas = stereo.project(CALIB, Xc) + noise_px * jax.random.normal(
        k3, (M, 3))
    w = (Xc[:, 2] > 0.5).astype(jnp.float32)
    dpose = 0.015 * jax.random.normal(k4, (P, 6))
    dpose = dpose.at[0].set(0.0)
    poses0 = jax.vmap(se3.retract)(poses_gt, dpose)
    points0 = points_gt + 0.15 * jax.random.normal(k5, (L, 3))
    return (poses_gt, points_gt, poses0, points0,
            np.asarray(cam_idx), np.asarray(lm_idx),
            np.asarray(meas), np.asarray(w))


def test_partition_routes_every_observation():
    key = jax.random.PRNGKey(0)
    _, _, _, points0, ci, li, meas, w = make_megaproblem(key)
    n_dev = 8
    pts_sh, cam_sh, lm_sh, meas_sh, w_sh = partition_megabundle(
        points0, ci, li, meas, w, n_dev)
    L_loc = pts_sh.shape[1]
    assert n_dev * L_loc >= points0.shape[0]
    # every real observation lands on the device owning its landmark
    assert float(w_sh.sum()) == float(w.sum())
    for d in range(n_dev):
        live = w_sh[d] > 0
        glob = lm_sh[d][live] + d * L_loc
        assert (glob // L_loc == d).all()
    # landmark rows round-trip
    np.testing.assert_array_equal(
        pts_sh.reshape(-1, 3)[: points0.shape[0]], np.asarray(points0))


def test_tp_matches_single_device():
    key = jax.random.PRNGKey(1)
    (poses_gt, points_gt, poses0, points0, ci, li, meas, w) = \
        make_megaproblem(key)
    n_dev = 8
    mesh = mesh_lib.make_mesh(n_dev, axis="tp")

    ref_poses, ref_points, ref_cost, _ = ba.optimize_bundle(
        jnp.asarray(poses0), jnp.asarray(points0), jnp.asarray(ci),
        jnp.asarray(li), jnp.asarray(meas), jnp.asarray(w), CALIB,
        iters=20, engine="onehot",
    )

    parts = partition_megabundle(points0, ci, li, meas, w, n_dev)
    tp_poses, tp_points, tp_cost, tp_cost0 = optimize_megabundle(
        mesh, poses0, *parts, CALIB, iters=20, engine="onehot",
    )

    assert tp_cost0 > 10.0
    assert tp_cost < 0.9 * tp_cost0
    assert abs(tp_cost - float(ref_cost)) < 1e-2 * float(ref_cost), (
        tp_cost, float(ref_cost))
    for p in range(poses0.shape[0]):
        d = se3.local(ref_poses[p], jnp.asarray(tp_poses)[p])
        assert float(jnp.linalg.norm(d)) < 1e-3, (p, d)
    # landmark accuracy parity (identity can differ in flat valleys)
    L = points0.shape[0]
    err_ref = float(jnp.mean(jnp.linalg.norm(
        ref_points - points_gt, axis=-1)))
    err_tp = float(np.mean(np.linalg.norm(
        tp_points[:L] - np.asarray(points_gt), axis=-1)))
    assert err_tp < err_ref + 0.01, (err_tp, err_ref)


def test_tp_converges_toward_ground_truth():
    key = jax.random.PRNGKey(2)
    (poses_gt, _, poses0, points0, ci, li, meas, w) = make_megaproblem(
        key, noise_px=0.0)
    mesh = mesh_lib.make_mesh(8, axis="tp")
    parts = partition_megabundle(points0, ci, li, meas, w, 8)
    tp_poses, _, tp_cost, tp_cost0 = optimize_megabundle(
        mesh, poses0, *parts, CALIB, iters=25,
    )
    assert tp_cost < 1e-2 * tp_cost0
    err0 = max(float(jnp.linalg.norm(se3.local(poses_gt[p],
                                               jnp.asarray(poses0)[p])))
               for p in range(poses0.shape[0]))
    err1 = max(float(jnp.linalg.norm(se3.local(poses_gt[p],
                                               jnp.asarray(tp_poses)[p])))
               for p in range(poses0.shape[0]))
    assert err1 < 0.1 * err0, (err0, err1)


def test_mesh_axis_mismatch_fails_loud():
    """A mesh whose tp axis is narrower than the host partitioning must
    raise, not silently solve shard 0 only (the shard_map would treat the
    pre-sharded device dim as data). Regression for the dryrun harness
    calling optimize_megabundle on a truncated mesh."""
    key = jax.random.PRNGKey(3)
    _, _, poses0, points0, ci, li, meas, w = make_megaproblem(key, L=64)
    mesh = mesh_lib.make_mesh(4, axis="tp")
    parts = partition_megabundle(points0, ci, li, meas, w, 8)
    try:
        optimize_megabundle(mesh, poses0, *parts, CALIB, iters=1)
    except ValueError as e:
        assert "partitioned for 8" in str(e)
    else:
        raise AssertionError("mismatched mesh axis did not raise")
