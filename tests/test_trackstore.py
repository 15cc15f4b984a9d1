import numpy as np
import pytest

from slam_tpu.models.trackstore import NO_ID, TrackStore


class FakeFrontend:
    """Minimal FrontendResult stand-in with a known match topology."""

    def __init__(self, F=5, K=8):
        rng = np.random.default_rng(0)
        self.links = rng.uniform(0, 100, (F, K, 3)).astype(np.float32)
        self.links[..., 1] = self.links[..., 0] - 5.0  # xr < xl
        self.link_valid = np.ones((F, K), bool)
        self.xy = rng.uniform(0, 100, (F, K, 2)).astype(np.float32)
        self.match_prev = np.full((F, K), -1, np.int32)
        self.inlier_prev = np.zeros((F, K), bool)
        self.inlier_frac = np.full((F,), 0.9, np.float32)

    def chain(self, frame, cur_slot, prev_slot, inlier=True):
        self.match_prev[frame, cur_slot] = prev_slot
        self.inlier_prev[frame, cur_slot] = inlier


@pytest.fixture
def store():
    fe = FakeFrontend()
    # track A: frame0 slot0 -> frame1 slot1 -> frame2 slot2 -> frame3 slot3
    fe.chain(1, 1, 0)
    fe.chain(2, 2, 1)
    fe.chain(3, 3, 2)
    # track B: frame1 slot4 -> frame2 slot4
    fe.chain(2, 4, 4)
    # outlier match: must NOT create a track
    fe.chain(4, 5, 5, inlier=False)
    return TrackStore.from_frontend(fe)


def test_track_creation_and_extension(store):
    assert store.num_tracks == 2
    tA = int(store.track_ids[0, 0])
    assert tA != NO_ID
    np.testing.assert_array_equal(store.frames(tA), [0, 1, 2, 3])
    tB = int(store.track_ids[1, 4])
    np.testing.assert_array_equal(store.frames(tB), [1, 2])


def test_outlier_match_ignored(store):
    assert store.track_ids[4, 5] == NO_ID
    assert store.track_ids[3, 5] == NO_ID


def test_track_query_api(store):
    tA = int(store.track_ids[0, 0])
    links = store.track(tA)
    assert set(links.keys()) == {0, 1, 2, 3}
    np.testing.assert_allclose(links[2], store.links[2, 2])
    assert store.last_frame_of_track(tA) == 3
    assert tA in store.tracks(2)
    np.testing.assert_allclose(store.link(1, tA), store.links[1, 1])
    with pytest.raises(KeyError):
        store.link(4, tA)


def test_track_lengths_all_ge_2(store):
    assert (store.track_lengths() >= 2).all()
    store.check_consistency()


def test_tracks_alive_between(store):
    tA = int(store.track_ids[0, 0])
    tB = int(store.track_ids[1, 4])
    alive = store.tracks_alive_between(1, 2)
    assert set(alive) == {tA, tB}
    alive03 = store.tracks_alive_between(3, 4)
    assert set(alive03) == {tA}


def test_connectivity(store):
    conn = store.connectivity()
    # frame0-1 share track A; frame1-2 share A and B; frame2-3 share A
    np.testing.assert_array_equal(conn, [1, 2, 1, 0])


def test_serialization_roundtrip(store, tmp_path):
    p = tmp_path / "db.npz"
    store.save(p)
    loaded = TrackStore.load(p)
    np.testing.assert_array_equal(loaded.track_ids, store.track_ids)
    np.testing.assert_array_equal(loaded.track_offsets, store.track_offsets)
    assert loaded.num_tracks == store.num_tracks
    loaded.check_consistency()


def test_frame_snapshot_roundtrip(store, tmp_path):
    p = tmp_path / "frame2.npz"
    store.save_frame(p, 2)
    snap = TrackStore.load_frame(p)
    assert int(snap["frame_id"]) == 2
    np.testing.assert_allclose(snap["links"], store.links[2])
    np.testing.assert_array_equal(snap["track_ids"], store.track_ids[2])


def test_stats(store):
    s = store.stats()
    assert s["num_tracks"] == 2
    assert s["max_track_length"] == 4
    assert s["min_track_length"] == 2


@pytest.mark.slow
def test_from_real_frontend_shapes():
    """Integration: build from an actual frontend run (small scene)."""
    import jax
    from slam_tpu.config import FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig
    from slam_tpu.models import frontend
    from slam_tpu.utils import synthetic

    cfg = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=128),
        runtime=RuntimeConfig(chunk_frames=6),
    )
    scene = synthetic.make_scene(
        jax.random.PRNGKey(1), num_frames=8, num_landmarks=1500, hw=(128, 256)
    )
    L, R = synthetic.render_sequence(scene)
    res = frontend.run_frontend(L, R, scene.calib, cfg)
    db = TrackStore.from_frontend(res)
    assert db.num_tracks > 50
    db.check_consistency()
    # long tracks exist (points visible across many frames)
    assert int(db.track_lengths().max()) >= 4
