"""Windowed bundle adjustment over a real synthetic pipeline run."""

import jax
import numpy as np
import pytest

from slam_tpu.config import (
    BundleConfig, FeatureConfig, KeyframeConfig, RansacConfig, RuntimeConfig,
    SlamConfig,
)
from slam_tpu.models import bundle, frontend
from slam_tpu.models.trackstore import TrackStore
from slam_tpu.utils import metrics, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=512, border=8),
    ransac=RansacConfig(num_hypotheses=192),
    runtime=RuntimeConfig(chunk_frames=8),
    keyframes=KeyframeConfig(min_gap=3, max_gap=8, max_dist_m=6.0),
    bundle=BundleConfig(max_poses=10, max_landmarks=256, max_obs=1024,
                        lm_iters=12),
)


@pytest.fixture(scope="module")
def pipeline():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(7), num_frames=24, num_landmarks=3000,
        hw=(160, 320), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    res = frontend.run_frontend(L, R, scene.calib, CFG)
    db = TrackStore.from_frontend(res)
    return scene, res, db


def test_select_keyframes(pipeline):
    scene, res, db = pipeline
    kfs = bundle.select_keyframes(db, res.T_w2c, CFG.keyframes)
    assert kfs[0] == 0
    assert kfs[-1] == db.num_frames - 1
    gaps = np.diff(kfs)
    assert (gaps >= CFG.keyframes.min_gap).all() or gaps[-1] >= 1
    assert (gaps <= CFG.keyframes.max_gap).all()


def test_windows_and_optimization_improve_trajectory(pipeline):
    scene, res, db = pipeline
    out = bundle.run_bundles(db, res.T_w2c, scene.calib, CFG)
    B = out.poses.shape[0]
    assert B == len(out.keyframes) - 1
    # finite costs, every window converged to something sane
    assert np.isfinite(out.cost).all()
    # keyframe trajectory error vs ground truth
    kfs = out.keyframes
    gt = np.asarray(scene.T_w2c)[kfs]
    ate_ba = metrics.ate_rmse(out.T_w2c_keyframes, gt)
    ate_fe = metrics.ate_rmse(np.asarray(res.T_w2c)[kfs], gt)
    # BA should not be (much) worse than the frontend chain and must be
    # accurate in absolute terms on this 19 m run
    assert ate_ba < max(1.2 * ate_fe, 0.15), (ate_ba, ate_fe)


def test_relative_covariances_sane(pipeline):
    scene, res, db = pipeline
    out = bundle.run_bundles(db, res.T_w2c, scene.calib, CFG)
    covs = out.rel_cov
    # symmetric positive semidefinite, small on well-constrained windows
    for c in covs:
        np.testing.assert_allclose(c, c.T, atol=1e-8)
        eig = np.linalg.eigvalsh(c)
        assert (eig > -1e-8).all()
        assert eig.max() < 1.0  # well-observed synthetic windows


def test_frame_poses_from_bundles(pipeline):
    scene, res, db = pipeline
    out = bundle.run_bundles(db, res.T_w2c, scene.calib, CFG)
    T = bundle.frame_poses_from_bundles(out, db.num_frames)
    gt = np.asarray(scene.T_w2c)
    ate = metrics.ate_rmse(T, gt)
    assert ate < 0.3, ate


def test_device_batch_tail_padding_equivalence(pipeline):
    """optimize_windows pads a short tail slice with zero-weight dummy
    windows instead of compiling a second program for the remainder
    shape; results must match the single-slice run exactly."""
    scene, res, db = pipeline
    kfs = bundle.select_keyframes(db, res.T_w2c, CFG.keyframes)
    batch = bundle.build_windows(db, res.T_w2c, kfs, CFG.bundle)
    bundle.init_landmarks(batch, scene.calib)
    assert batch.num_windows >= 3  # need a tail for the padded path
    one = bundle.optimize_windows(batch, scene.calib, CFG.bundle,
                                  device_batch=64)
    db2 = batch.num_windows - 1  # forces a 1-window padded tail slice
    two = bundle.optimize_windows(batch, scene.calib, CFG.bundle,
                                  device_batch=db2)
    np.testing.assert_allclose(one.rel_T, two.rel_T, rtol=0, atol=1e-5)
    np.testing.assert_allclose(one.cost, two.cost, rtol=1e-5)
    np.testing.assert_allclose(one.rel_cov, two.rel_cov,
                               rtol=1e-4, atol=1e-7)
