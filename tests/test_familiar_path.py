"""Familiar-path loop-closure semantics on a multi-revisit scene.

The reference defers closures while the vehicle re-traverses an
already-mapped segment and commits exactly one more closure, from the
back, when the segment is exited (loop_closure.py:311-349). A 1.5-turn
circular drive produces exactly that situation: the second lap is one
long familiar segment that ends when the sequence ends.
"""

import dataclasses

import jax
import numpy as np
import pytest

from slam_tpu.config import (
    BundleConfig, FeatureConfig, KeyframeConfig, LoopConfig, RansacConfig,
    RuntimeConfig, SlamConfig,
)
from slam_tpu import pipeline
from slam_tpu.utils import metrics, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=512, border=8),
    ransac=RansacConfig(num_hypotheses=192),
    runtime=RuntimeConfig(chunk_frames=10),
    keyframes=KeyframeConfig(min_gap=2, max_gap=6, max_dist_m=6.0,
                             max_angle_deg=25.0),
    bundle=BundleConfig(max_poses=8, max_landmarks=256, max_obs=1024,
                        lm_iters=10),
    loop=LoopConfig(mahalanobis_thresh=300.0, min_inliers=40,
                    keyframe_gap=5, max_candidates=8),
)


@pytest.fixture(scope="module")
def revisit_run():
    # 1.5 laps of the circle: frames ~[100, 150) re-traverse the first half
    scene = synthetic.make_scene(
        jax.random.PRNGKey(3), num_frames=150, num_landmarks=6000,
        trajectory="loop", hw=(160, 320), loop_turns=1.5,
    )
    L, R = synthetic.render_sequence(scene)
    res = pipeline.run_pipeline(L, R, scene.calib, CFG, verbose=False)
    return scene, res


@pytest.mark.slow
def test_commit_on_segment_exit(revisit_run):
    scene, res = revisit_run
    assert len(res.closures) >= 2, [
        (c.frame_i, c.frame_j) for c in res.closures
    ]
    # first closure opens the familiar segment near the start of lap 2
    first = res.closures[0]
    assert first.kf_j - first.kf_i >= CFG.loop.keyframe_gap
    # a later closure is committed from the back of the deferred segment:
    # its query frame must lie deeper into lap 2 than the first closure's
    last = res.closures[-1]
    assert last.frame_j > first.frame_j
    # every closure reconnects lap 2 with lap 1 (earlier target frame)
    for c in res.closures:
        assert c.frame_i < c.frame_j
        assert c.num_inliers > CFG.loop.min_inliers


@pytest.mark.slow
def test_revisit_trajectory_stays_accurate(revisit_run):
    scene, res = revisit_run
    kfs = res.pose_graph.keyframes
    gt = np.asarray(scene.T_w2c)[kfs]
    ate = metrics.ate_rmse(res.pose_graph.nodes, gt)
    # 1.5 laps = ~565 m driven; the closed graph must stay metrically tight
    assert ate < 2.0, ate
