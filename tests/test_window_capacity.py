"""Window-construction capacity behavior: no silent truncation.

Two guarantees added after round 1:
  * a keyframe gap wider than BundleConfig.max_poses-1 raises instead of
    silently cutting the window (which would mislabel rel_T/rel_cov);
  * when a window's observations exceed max_obs, the kept set is the
    longest-track-ranked one (not an arbitrary array prefix) and a warning
    reports the drop count. The reference keeps every factor
    (final_project/backend/GTSam/bundle.py:129-169); capacity is the
    static-shape price and must be paid loudly.
"""

import numpy as np
import pytest

from slam_tpu.config import BundleConfig
from slam_tpu.models import bundle


class FakeDB:
    """Minimal track-store surface consumed by build_windows."""

    def __init__(self, obs, num_frames, max_kp=64):
        # obs: list of (track, frame, slot)
        obs = sorted(obs)
        self.tr_sorted = np.array([o[0] for o in obs], np.int32)
        self.fr_sorted = np.array([o[1] for o in obs], np.int32)
        self.slot_sorted = np.array([o[2] for o in obs], np.int32)
        self.num_frames = num_frames
        self.links = np.zeros((num_frames, max_kp, 3), np.float32)
        for t, f, s in obs:
            # plausible rectified-stereo link, unique per (track, frame)
            xl = 200.0 + 3.0 * t + 0.1 * f
            self.links[f, s] = (xl, xl - 8.0, 60.0 + t)


def _straight_T(F):
    T = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    T[:, 2, 3] = -0.5 * np.arange(F)
    return T


def test_wide_gap_raises():
    obs = [(t, f, t) for t in range(4) for f in range(8)]
    db = FakeDB(obs, num_frames=8)
    cfg = BundleConfig(max_poses=4, max_landmarks=16, max_obs=64)
    with pytest.raises(ValueError, match="max_poses"):
        bundle.build_windows(db, _straight_T(8), [0, 7], cfg)


def test_overfull_window_keeps_longest_tracks_and_warns():
    F = 6
    # 10 long tracks spanning all 6 frames (60 obs) + 20 short 2-frame
    # tracks (40 obs) = 100 obs; capacity 70 forces a ranked drop.
    obs = []
    for t in range(10):
        for f in range(F):
            obs.append((t, f, t))
    for i, t in enumerate(range(100, 120)):
        f0 = i % (F - 1)
        obs.append((t, f0, 20 + i))
        obs.append((t, f0 + 1, 20 + i))
    db = FakeDB(obs, num_frames=F)
    cfg = BundleConfig(max_poses=8, max_landmarks=64, max_obs=70)

    with pytest.warns(UserWarning, match="dropped"):
        batch = bundle.build_windows(db, _straight_T(F), [0, F - 1], cfg)

    active = batch.w[0] > 0
    kept_tracks = batch.track_of_lm[0][batch.lm_idx[0][active]]
    # every observation of every long track survived
    for t in range(10):
        assert (kept_tracks == t).sum() == F, t
    # all kept tracks still have >= 2 observations (a 1-obs track
    # constrains nothing)
    ids, counts = np.unique(kept_tracks, return_counts=True)
    assert (counts >= 2).all()
    # capacity respected
    assert active.sum() <= cfg.max_obs


def test_under_capacity_window_keeps_everything():
    F = 5
    obs = [(t, f, t) for t in range(8) for f in range(F)]
    db = FakeDB(obs, num_frames=F)
    cfg = BundleConfig(max_poses=8, max_landmarks=16, max_obs=64)
    batch = bundle.build_windows(db, _straight_T(F), [0, F - 1], cfg)
    assert int((batch.w[0] > 0).sum()) == len(obs)
