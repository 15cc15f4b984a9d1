"""Stage-overlap (pipeline-parallel) scheduler: results must be identical
to the sequential pipeline — same frontend chain, same track chaining,
same keyframe cuts, same bundle solutions (SURVEY.md §2.4 PP row)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full rendered-scene pipeline on the 8-device mesh

from slam_tpu.config import (
    BundleConfig, FeatureConfig, KeyframeConfig, RansacConfig, RuntimeConfig,
    SlamConfig,
)
from slam_tpu.models import bundle
from slam_tpu.models.trackstore import TrackStore
from slam_tpu.parallel import mesh as mesh_lib
from slam_tpu.parallel.sharded_frontend import run_frontend_sharded
from slam_tpu.parallel.stage_overlap import run_pipeline_overlapped, split_mesh
from slam_tpu.utils import synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=128),
    runtime=RuntimeConfig(chunk_frames=4),
    keyframes=KeyframeConfig(min_gap=2, max_gap=6, max_dist_m=5.0),
    bundle=BundleConfig(max_poses=8, max_landmarks=128, max_obs=512,
                        lm_iters=8),
)


def test_split_mesh_partitions_devices():
    m = mesh_lib.make_mesh()
    fe, ba = split_mesh(m)
    assert fe.devices.size + ba.devices.size == m.devices.size
    assert set(fe.devices.flatten()).isdisjoint(set(ba.devices.flatten()))
    fe1, ba1 = split_mesh(None)
    assert fe1.devices.size == ba1.devices.size == 1


def test_run_pipeline_overlap_flag():
    """run_pipeline(mesh=..., overlap=True) runs the whole pipeline with
    the stage-group scheduler and produces a coherent result."""
    from slam_tpu import pipeline as pipeline_mod

    scene = synthetic.make_scene(
        jax.random.PRNGKey(9), num_frames=16, num_landmarks=2000,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    m = mesh_lib.make_mesh()
    res = pipeline_mod.run_pipeline(L, R, scene.calib, CFG, mesh=m,
                                    overlap=True, run_loop_closure=False,
                                    verbose=False)
    rep = pipeline_mod.evaluate(res, np.asarray(scene.T_w2c))
    assert rep["bundles_kf"]["ate_rmse_m"] < 0.5
    assert "frontend+bundles_overlapped" in res.timings


def test_overlapped_matches_sequential():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(7), num_frames=32, num_landmarks=2500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    m = mesh_lib.make_mesh()
    fe_mesh, _ = split_mesh(m)

    fe, db, bundles = run_pipeline_overlapped(L, R, scene.calib, CFG, mesh=m)

    # frontend: bitwise-identical to the frame-sharded frontend on the
    # same stage group (same step size, same key stream)
    fe_ref = run_frontend_sharded(L, R, scene.calib, fe_mesh, CFG)
    np.testing.assert_allclose(fe.T_w2c, fe_ref.T_w2c, atol=1e-6)

    # track chaining: identical to the batch TrackStore build
    db_ref = TrackStore.from_frontend(fe_ref, use_native=False)
    assert db.num_tracks == db_ref.num_tracks
    np.testing.assert_array_equal(db.track_ids, db_ref.track_ids)

    # keyframes + windows: identical cuts, matching bundle solutions
    kfs_ref = bundle.select_keyframes(db_ref, fe_ref.T_w2c, CFG.keyframes)
    assert bundles.keyframes == kfs_ref
    batch = bundle.build_windows(db_ref, fe_ref.T_w2c, kfs_ref, CFG.bundle)
    bundle.init_landmarks(batch, scene.calib)
    ref = bundle.optimize_windows(batch, scene.calib, CFG.bundle)
    assert bundles.rel_T.shape == ref.rel_T.shape
    np.testing.assert_allclose(bundles.rel_T, ref.rel_T, atol=5e-4)
    np.testing.assert_allclose(
        bundles.T_w2c_keyframes[:, :3, 3], ref.T_w2c_keyframes[:, :3, 3],
        atol=5e-3,
    )
