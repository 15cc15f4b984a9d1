"""Frontend incremental checkpointing + resume-from-middle (reference
ex4_v2.py:696-776, 1122-1132 behavior)."""

import jax
import numpy as np
import pytest

from slam_tpu.config import FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig
from slam_tpu.models import frontend
from slam_tpu.utils import synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=96),
    runtime=RuntimeConfig(chunk_frames=4),
)


@pytest.fixture(scope="module")
def seq():
    scene = synthetic.make_scene(
        jax.random.PRNGKey(21), num_frames=12, num_landmarks=1500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    return scene, L, R


@pytest.mark.slow
def test_resume_matches_uninterrupted(seq, tmp_path):
    scene, L, R = seq
    ck = tmp_path / "fe.npz"
    # full run with checkpoints every 4 frames
    full = frontend.run_frontend(L, R, scene.calib, CFG,
                                 checkpoint_path=str(ck), checkpoint_every=4)
    assert ck.exists()

    # simulate a crash after 8 frames: run only the first 8, checkpointing
    ck2 = tmp_path / "fe2.npz"
    frontend.run_frontend(L[:8], R[:8], scene.calib, CFG,
                          checkpoint_path=str(ck2), checkpoint_every=4)
    # resume over the full sequence
    resumed = frontend.run_frontend(L, R, scene.calib, CFG,
                                    checkpoint_path=str(ck2),
                                    checkpoint_every=4, resume=True)
    assert resumed.T_w2c.shape == full.T_w2c.shape
    np.testing.assert_allclose(resumed.xy, full.xy, atol=1e-5)
    np.testing.assert_array_equal(resumed.link_valid, full.link_valid)
    # bit-identical trajectories: the RANSAC key stream is position-based
    # (fold_in(seed, chunk_index)), so resuming mid-sequence replays the
    # exact keys of an uninterrupted run
    np.testing.assert_array_equal(resumed.T_w2c, full.T_w2c)
    np.testing.assert_array_equal(resumed.pose_ok, full.pose_ok)


@pytest.mark.slow
def test_legacy_monolithic_checkpoint_migrates(seq, tmp_path):
    """Resuming from a pre-segmented (monolithic) checkpoint must migrate
    it to the segmented layout BEFORE appending — the old save order
    (segN then meta-only main file) would otherwise destroy the sole copy
    of the loaded frames — and later resumes must still work."""
    scene, L, R = seq
    ck = tmp_path / "fe_legacy.npz"
    # produce a segmented half-run checkpoint, then rewrite it monolithic
    frontend.run_frontend(L[:8], R[:8], scene.calib, CFG,
                          checkpoint_path=str(ck), checkpoint_every=4)
    outs, T_list, carry, T_carry, nxt = frontend.load_frontend_checkpoint(ck)
    blob = {k: np.concatenate([o[k] for o in outs], axis=0)
            for k in frontend._CKPT_KEYS + ("T_chain",)}
    blob["T_w2c"] = np.concatenate(T_list, axis=0)
    for k, v in (carry or {}).items():
        blob[f"carry_{k}"] = np.asarray(v)
    blob["T_carry"] = T_carry
    blob["next_start"] = np.int64(nxt)
    for p in tmp_path.glob("fe_legacy.seg*.npz"):
        p.unlink()
    np.savez_compressed(str(ck), **blob)

    full = frontend.run_frontend(L, R, scene.calib, CFG)
    resumed = frontend.run_frontend(L, R, scene.calib, CFG,
                                    checkpoint_path=str(ck),
                                    checkpoint_every=4, resume=True)
    np.testing.assert_array_equal(resumed.T_w2c, full.T_w2c)
    # the monolithic file was migrated: seg0000 exists, meta records it
    assert (tmp_path / "fe_legacy.seg0000.npz").exists()
    with np.load(str(ck)) as z:
        assert "num_segments" in z.files
    # a second resume (fully covered) still reproduces the run
    again = frontend.run_frontend(L, R, scene.calib, CFG,
                                  checkpoint_path=str(ck), resume=True)
    np.testing.assert_array_equal(again.T_w2c, full.T_w2c)


def test_resume_rejects_changed_config(seq, tmp_path):
    """A checkpoint written under one detector/matcher/RANSAC config must
    not be silently resumed under another (the stitched result would mix
    frames computed under two configs)."""
    scene, L, R = seq
    ck = tmp_path / "fe_fp.npz"
    frontend.run_frontend(L[:8], R[:8], scene.calib, CFG,
                          checkpoint_path=str(ck), checkpoint_every=4)
    changed = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=64),  # != CFG's 96
        runtime=RuntimeConfig(chunk_frames=4),
    )
    with pytest.raises(RuntimeError, match="different feature"):
        frontend.run_frontend(L, R, scene.calib, changed,
                              checkpoint_path=str(ck), checkpoint_every=4,
                              resume=True)
    # runtime-only changes (chunking, cache paths) must NOT invalidate
    relaxed = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=96),
        runtime=RuntimeConfig(chunk_frames=4, compile_cache_dir=""),
    )
    resumed = frontend.run_frontend(L, R, scene.calib, relaxed,
                                    checkpoint_path=str(ck),
                                    checkpoint_every=4, resume=True)
    assert resumed.T_w2c.shape[0] == L.shape[0]


def test_resume_noop_when_complete(seq, tmp_path):
    scene, L, R = seq
    ck = tmp_path / "fe3.npz"
    full = frontend.run_frontend(L, R, scene.calib, CFG,
                                 checkpoint_path=str(ck))
    again = frontend.run_frontend(L, R, scene.calib, CFG,
                                  checkpoint_path=str(ck), resume=True)
    np.testing.assert_allclose(again.T_w2c, full.T_w2c, atol=1e-6)
    np.testing.assert_array_equal(again.match_prev, full.match_prev)


@pytest.mark.slow
def test_segment_sized_descriptor_recompute(seq, tmp_path):
    """Checkpoint segments span multiple chunks (checkpoint_every=8 vs
    chunk_frames=4): a resumed run must recompute dropped descriptor
    chunks in chunk-sized blocks, not trace a segment-sized batch
    (regression: the recompute once assumed n <= chunk and crashed /
    compiled a fresh segment-sized shape)."""
    scene, L, R = seq
    ck = tmp_path / "fe_seg.npz"
    full = frontend.run_frontend(L, R, scene.calib, CFG,
                                 checkpoint_path=str(ck), checkpoint_every=8)
    # resume purely from the checkpoint: every descriptor chunk is None
    resumed = frontend.run_frontend(L, R, scene.calib, CFG,
                                    checkpoint_path=str(ck),
                                    checkpoint_every=8, resume=True)
    # shape property must satisfy the (F, K, D) contract pre-materialization
    assert len(resumed.desc.shape) == 3
    assert resumed.desc.shape[0] == L.shape[0]
    # recomputed descriptors match the originals (detection deterministic)
    np.testing.assert_allclose(
        np.asarray(resumed.desc.numpy()), np.asarray(full.desc.numpy()),
        atol=1e-5)
