"""Full pipeline on the 8-device mesh (frame-sharded frontend +
window-sharded BA) vs single-device."""

import jax
import numpy as np
import pytest

from slam_tpu.config import (
    BundleConfig, FeatureConfig, KeyframeConfig, RansacConfig, RuntimeConfig,
    SlamConfig,
)
from slam_tpu import pipeline
from slam_tpu.parallel import mesh as mesh_lib
from slam_tpu.utils import metrics, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=96),
    runtime=RuntimeConfig(chunk_frames=2),  # 2 * 8 devices = 16/step
    keyframes=KeyframeConfig(min_gap=2, max_gap=6, max_dist_m=5.0),
    bundle=BundleConfig(max_poses=8, max_landmarks=128, max_obs=512,
                        lm_iters=8),
)


@pytest.mark.slow
def test_pipeline_on_mesh():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(23), num_frames=16, num_landmarks=2000,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    m = mesh_lib.make_mesh()
    res = pipeline.run_pipeline(
        np.asarray(L), np.asarray(R), scene.calib, CFG,
        run_loop_closure=False, verbose=False, mesh=m,
    )
    gt = np.asarray(scene.T_w2c)
    ate = metrics.ate_rmse(res.T_frontend, gt)
    assert ate < 0.3, ate
    kfs = res.pose_graph.keyframes
    ate_kf = metrics.ate_rmse(res.pose_graph.nodes, gt[kfs])
    assert ate_kf < 0.3, ate_kf
    assert np.isfinite(res.bundles.cost).all()
