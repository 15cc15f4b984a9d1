"""CLI smoke test + pipelined (prefetcher-fed) frontend parity."""

import json

import jax
import numpy as np
import pytest

from slam_tpu.config import FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig
from slam_tpu.models import frontend
from slam_tpu.parallel import pipeline as ppipe
from slam_tpu.utils import synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=96),
    runtime=RuntimeConfig(chunk_frames=4),
)


def test_pipelined_frontend_matches_eager(tmp_path):
    runtime = pytest.importorskip("slam_tpu.runtime")
    if not runtime._load():
        pytest.skip("native runtime unavailable")
    import cv2

    scene = synthetic.make_scene(
        jax.random.PRNGKey(5), num_frames=8, num_landmarks=1500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    Lu = np.clip(L * 255, 0, 255).astype(np.uint8)
    Ru = np.clip(R * 255, 0, 255).astype(np.uint8)
    lps, rps = [], []
    for i in range(8):
        lp = tmp_path / f"l{i:06d}.png"
        rp = tmp_path / f"r{i:06d}.png"
        cv2.imwrite(str(lp), Lu[i])
        cv2.imwrite(str(rp), Ru[i])
        lps.append(lp)
        rps.append(rp)

    res_pipe = ppipe.run_frontend_pipelined(lps, rps, (128, 256),
                                            scene.calib, CFG)
    res_eager = frontend.run_frontend(
        Lu.astype(np.float32) / 255.0, Ru.astype(np.float32) / 255.0,
        scene.calib, CFG,
    )
    np.testing.assert_allclose(res_pipe.xy, res_eager.xy, atol=1e-4)
    np.testing.assert_array_equal(res_pipe.link_valid, res_eager.link_valid)
    d = np.linalg.norm(
        res_pipe.T_w2c[:, :3, 3] - res_eager.T_w2c[:, :3, 3], axis=-1
    )
    assert d.max() < 0.05


def test_pipelined_resume_rejects_changed_config(tmp_path):
    """run_frontend_pipelined must enforce the same checkpoint config
    fingerprint as run_frontend (review finding: the pipelined path once
    saved and resumed checkpoints without it)."""
    runtime = pytest.importorskip("slam_tpu.runtime")
    if not runtime._load():
        pytest.skip("native runtime unavailable")
    import cv2

    scene = synthetic.make_scene(
        jax.random.PRNGKey(6), num_frames=8, num_landmarks=1500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    Lu = np.clip(L * 255, 0, 255).astype(np.uint8)
    Ru = np.clip(R * 255, 0, 255).astype(np.uint8)
    lps, rps = [], []
    for i in range(8):
        lp = tmp_path / f"l{i:06d}.png"
        rp = tmp_path / f"r{i:06d}.png"
        cv2.imwrite(str(lp), Lu[i])
        cv2.imwrite(str(rp), Ru[i])
        lps.append(lp)
        rps.append(rp)
    ck = tmp_path / "fe_pipe.npz"
    ppipe.run_frontend_pipelined(lps, rps, (128, 256), scene.calib, CFG,
                                 checkpoint_path=str(ck),
                                 checkpoint_every=4)
    changed = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=64),
        runtime=RuntimeConfig(chunk_frames=4),
    )
    with pytest.raises(RuntimeError, match="different feature"):
        ppipe.run_frontend_pipelined(lps, rps, (128, 256), scene.calib,
                                     changed, checkpoint_path=str(ck),
                                     checkpoint_every=4, resume=True)
    # a different chunk size changes the RANSAC key stream: must also fail
    rechunked = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=96),
        runtime=RuntimeConfig(chunk_frames=8),
    )
    with pytest.raises(RuntimeError, match="different feature"):
        ppipe.run_frontend_pipelined(lps, rps, (128, 256), scene.calib,
                                     rechunked, checkpoint_path=str(ck),
                                     checkpoint_every=4, resume=True)


@pytest.mark.slow
def test_cli_synthetic_run(tmp_path):
    from slam_tpu.__main__ import main

    cfg = CFG
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)
    out = tmp_path / "run"
    rc = main([
        "--synthetic", "straight", "--frames", "8",
        "--out", str(out), "--config", str(cfg_path),
        "--no-loop-closure", "--no-analysis",
    ])
    assert rc == 0
    rep = json.loads((out / "synthetic" / "report.json").read_text())
    assert "frontend" in rep
    assert (out / "config.json").exists()


def test_visualize_track(tmp_path):
    from slam_tpu.models.trackstore import TrackStore
    from slam_tpu.utils import analysis

    scene = synthetic.make_scene(
        jax.random.PRNGKey(6), num_frames=8, num_landmarks=1500,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    res = frontend.run_frontend(L, R, scene.calib, CFG)
    db = TrackStore.from_frontend(res)
    lengths = db.track_lengths()
    t = int(np.argmax(lengths))
    analysis.visualize_track(tmp_path, db, L, t)
    assert (tmp_path / f"track_{t}.png").exists()


@pytest.mark.slow
def test_multi_sequence_runner():
    seqs = {}
    for i, name in enumerate(["a", "b"]):
        scene = synthetic.make_scene(
            jax.random.PRNGKey(30 + i), num_frames=8, num_landmarks=1200,
            hw=(128, 256), step_m=0.8,
        )
        L, R = synthetic.render_sequence(scene)
        seqs[name] = (np.asarray(L), np.asarray(R),
                      np.asarray(scene.calib), np.asarray(scene.T_w2c))
    reports = ppipe.run_multi_sequence(seqs, CFG, run_loop_closure=False)
    assert set(reports) == {"a", "b"}
    for rep in reports.values():
        assert rep["frontend"]["ate_rmse_m"] < 1.0
