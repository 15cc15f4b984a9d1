"""DB-only PnP trajectory reconstruction (gtsam_utils.calc_rel_T parity)."""

import jax
import pytest as _pytest

pytestmark = _pytest.mark.slow  # module fixture runs a full rendered frontend
import numpy as np
import pytest

from slam_tpu.config import FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig
from slam_tpu.models import db_odometry, frontend
from slam_tpu.models.trackstore import TrackStore
from slam_tpu.utils import metrics, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=384, border=8),
    ransac=RansacConfig(num_hypotheses=128),
    runtime=RuntimeConfig(chunk_frames=6),
)


@pytest.fixture(scope="module")
def db_and_scene():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(17), num_frames=12, num_landmarks=2000,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    res = frontend.run_frontend(L, R, scene.calib, CFG)
    return TrackStore.from_frontend(res), scene, res


def test_correspondences_shapes(db_and_scene):
    db, scene, _ = db_and_scene
    pl, cl, v = db_odometry.consecutive_correspondences(db, max_corr=256)
    assert pl.shape == (11, 256, 3)
    assert v.any(axis=1).all()  # every pair has common tracks


def test_db_trajectory_matches_frontend(db_and_scene):
    db, scene, res = db_and_scene
    T = db_odometry.pnp_trajectory_from_db(db, scene.calib)
    gt = np.asarray(scene.T_w2c)
    ate_db = metrics.ate_rmse(T, gt)
    ate_fe = metrics.ate_rmse(res.T_w2c, gt)
    # reconstructed-from-DB trajectory is as accurate as the live one
    assert ate_db < max(2.0 * ate_fe, 0.15), (ate_db, ate_fe)


def test_db_trajectory_after_roundtrip(db_and_scene, tmp_path):
    db, scene, _ = db_and_scene
    db.save(tmp_path / "db.npz")
    db2 = TrackStore.load(tmp_path / "db.npz")
    T = db_odometry.pnp_trajectory_from_db(db2, scene.calib)
    assert metrics.ate_rmse(T, np.asarray(scene.T_w2c)) < 0.5
