"""Sharded execution on the virtual 8-device CPU mesh: sharded BA must
match the single-device solution."""

import jax
import numpy as np
import pytest

from slam_tpu.config import (
    BundleConfig, FeatureConfig, KeyframeConfig, RansacConfig, RuntimeConfig,
    SlamConfig,
)
from slam_tpu.models import bundle, frontend
from slam_tpu.models.trackstore import TrackStore
from slam_tpu.parallel import mesh as mesh_lib
from slam_tpu.parallel import sharded_ba
from slam_tpu.utils import synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=384, border=8),
    ransac=RansacConfig(num_hypotheses=128),
    runtime=RuntimeConfig(chunk_frames=8),
    keyframes=KeyframeConfig(min_gap=2, max_gap=5, max_dist_m=5.0),
    bundle=BundleConfig(max_poses=8, max_landmarks=192, max_obs=768,
                        lm_iters=8),
)


def test_mesh_has_8_devices():
    m = mesh_lib.make_mesh()
    assert m.devices.size == 8


@pytest.fixture(scope="module")
def batch_and_calib():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(11), num_frames=20, num_landmarks=2500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    fe = frontend.run_frontend(L, R, scene.calib, CFG)
    db = TrackStore.from_frontend(fe)
    kfs = bundle.select_keyframes(db, fe.T_w2c, CFG.keyframes)
    b = bundle.build_windows(db, fe.T_w2c, kfs, CFG.bundle)
    bundle.init_landmarks(b, scene.calib)
    return b, scene.calib


@pytest.mark.slow
def test_sharded_ba_matches_single_device(batch_and_calib):
    batch, calib = batch_and_calib
    # single-device reference
    ref = bundle.optimize_windows(batch, calib, CFG.bundle)
    # sharded
    m = mesh_lib.make_mesh()
    poses, points, w2, cost, cost0, rel_T, rel_cov = (
        sharded_ba.optimize_windows_sharded(
            batch, calib, m, iters=CFG.bundle.lm_iters
        )
    )
    assert poses.shape[0] == batch.num_windows
    np.testing.assert_allclose(rel_T, ref.rel_T, atol=5e-4)
    np.testing.assert_allclose(cost, ref.cost, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(cost0, ref.cost0, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(rel_cov, ref.rel_cov, rtol=0.05, atol=1e-7)


@pytest.mark.slow
def test_sharded_frontend_matches_single_device():
    """Frame-axis-sharded frontend == single-device frontend (same chunk
    boundaries => identical RANSAC keys => identical outputs)."""
    import dataclasses

    from slam_tpu.parallel import sharded_frontend
    from slam_tpu.utils import metrics

    scene = synthetic.make_scene(
        jax.random.PRNGKey(13), num_frames=16, num_landmarks=2000,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    L, R = np.asarray(L), np.asarray(R)

    m = mesh_lib.make_mesh()
    # sharded step covers 2 * 8 = 16 frames in ONE step
    cfg_sh = dataclasses.replace(CFG, runtime=RuntimeConfig(chunk_frames=2))
    res_sh = sharded_frontend.run_frontend_sharded(L, R, scene.calib, m,
                                                   cfg_sh)
    # single-device reference with the same 16-frame chunking
    cfg_1 = dataclasses.replace(CFG, runtime=RuntimeConfig(chunk_frames=16))
    res_1 = frontend.run_frontend(L, R, scene.calib, cfg_1)

    np.testing.assert_allclose(res_sh.xy, res_1.xy, atol=1e-4)
    np.testing.assert_array_equal(res_sh.link_valid, res_1.link_valid)
    np.testing.assert_array_equal(res_sh.match_prev, res_1.match_prev)
    d = np.linalg.norm(
        metrics.camera_centers(res_sh.T_w2c)
        - metrics.camera_centers(res_1.T_w2c), axis=-1,
    )
    assert d.max() < 1e-3, d.max()


def test_sharded_ba_pads_odd_window_counts(batch_and_calib):
    batch, calib = batch_and_calib
    # truncate to a count not divisible by 8
    import dataclasses
    n = max(batch.num_windows - 1, 3)
    small = dataclasses.replace(
        batch,
        poses0=batch.poses0[:n], points0=batch.points0[:n],
        cam_idx=batch.cam_idx[:n], lm_idx=batch.lm_idx[:n],
        meas=batch.meas[:n], w=batch.w[:n], n_poses=batch.n_poses[:n],
        frames=batch.frames[:n], track_of_lm=batch.track_of_lm[:n],
        keyframes=batch.keyframes[: n + 1],
    )
    m = mesh_lib.make_mesh()
    poses, *_ = sharded_ba.optimize_windows_sharded(
        small, calib, m, iters=4
    )
    assert poses.shape[0] == n
