"""Frontend frame-failure recovery: a frame whose RANSAC fails must not
corrupt the global chain (reference recovery: reuse the last good relative
transform, VAN_ex/code/ex4_v2.py:1085-1104; the reference's final_project
raises "PnP failed" instead, gtsam_utils.py:101,127,138)."""

import jax
import numpy as np
import pytest

from slam_tpu.config import FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig
from slam_tpu.models import frontend
from slam_tpu.utils import metrics, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=96),
    runtime=RuntimeConfig(chunk_frames=4),
)


@pytest.fixture(scope="module")
def seq():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(11), num_frames=12, num_landmarks=1500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    return scene, np.asarray(L), np.asarray(R)


def test_black_frame_does_not_corrupt_trajectory(seq):
    scene, L, R = seq
    Lb, Rb = L.copy(), R.copy()
    Lb[5] = 0.0  # an all-black frame: zero features, RANSAC must fail
    Rb[5] = 0.0

    res = frontend.run_frontend(Lb, Rb, scene.calib, CFG)

    # failures are detected and surfaced, not silent
    assert not res.pose_ok[5]          # pair (4 -> 5): no current features
    assert not res.pose_ok[6]          # pair (5 -> 6): no previous features
    assert res.num_pose_failures >= 2

    # the failed frames coast on the last good relative transform instead
    # of injecting identity into the chain
    np.testing.assert_array_equal(res.T_rel[5], res.T_rel[4])

    # the trajectory stays close to ground truth despite the dropout (two
    # coasted frames on a ~0.8 m/frame run)
    ate = metrics.ate_rmse(res.T_w2c, np.asarray(scene.T_w2c))
    assert ate < 1.0, ate


def test_clean_run_reports_no_failures(seq):
    scene, L, R = seq
    res = frontend.run_frontend(L, R, scene.calib, CFG)
    assert res.num_pose_failures == 0
    assert res.pose_ok[1:].all()
    assert not res.pose_ok[0]  # frame 0 has no previous frame
