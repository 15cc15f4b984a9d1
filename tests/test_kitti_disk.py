"""On-disk KITTI-format drive: layout writer round-trip, native padded
decode, prefetcher checkpoint/resume, and the multi-resolution CLI batch
(BASELINE.json config #5 shape; reference Inputs.py:8-64 layout)."""

import json

import jax
import numpy as np
import pytest

from slam_tpu.config import (FeatureConfig, RansacConfig, RuntimeConfig,
                             SlamConfig)
from slam_tpu.models import frontend
from slam_tpu.parallel import pipeline as ppipe
from slam_tpu.utils import kitti, synthetic

CFG = SlamConfig(
    features=FeatureConfig(max_kp=256, border=8),
    ransac=RansacConfig(num_hypotheses=96),
    runtime=RuntimeConfig(chunk_frames=4),
)


def _scene_u8(key, frames=8, hw=(128, 256)):
    scene = synthetic.make_scene(
        jax.random.PRNGKey(key), num_frames=frames, num_landmarks=1500,
        hw=hw, step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    to_u8 = lambda x: np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)
    return to_u8(L), to_u8(R), np.asarray(scene.calib), np.asarray(scene.T_w2c)


def test_write_kitti_sequence_roundtrip(tmp_path):
    Lu, Ru, calib, T_gt = _scene_u8(11, frames=4)
    paths = kitti.write_kitti_sequence(tmp_path, "07", Lu, Ru, calib, T_gt)
    assert paths.exists()
    assert kitti.num_frames(paths) == 4

    np.testing.assert_allclose(kitti.calib_vector(paths), calib, rtol=1e-6)
    gt = kitti.read_ground_truth(paths)
    # float32 inversion round-trip: poses file is cam->world, reader inverts
    np.testing.assert_allclose(gt, T_gt, atol=1e-4)

    L2, R2, calib2, gt2 = kitti.load_sequence(paths)
    np.testing.assert_allclose(L2, Lu.astype(np.float32) / 255.0, atol=1e-3)
    np.testing.assert_allclose(R2, Ru.astype(np.float32) / 255.0, atol=1e-3)


def test_native_padded_decode(tmp_path):
    runtime = pytest.importorskip("slam_tpu.runtime")
    if not runtime._load():
        pytest.skip("native runtime unavailable")
    Lu, _, _, _ = _scene_u8(12, frames=1, hw=(100, 200))
    p = tmp_path / "img.png"
    kitti._imwrite_gray(p, Lu[0])

    bucket = (104, 208)
    got = runtime.load_png_gray_padded(p, bucket)
    want = kitti.pad_to_bucket(
        (Lu.astype(np.float32) / 255.0), bucket
    )[0]
    np.testing.assert_allclose(got, want, atol=1e-3)
    # exact-size decode unchanged
    got_exact = runtime.load_png_gray_padded(p, (100, 200))
    np.testing.assert_allclose(got_exact, Lu[0].astype(np.float32) / 255.0,
                               atol=1e-3)


def test_pipelined_checkpoint_resume(tmp_path):
    runtime = pytest.importorskip("slam_tpu.runtime")
    if not runtime._load():
        pytest.skip("native runtime unavailable")
    Lu, Ru, calib, _ = _scene_u8(13, frames=8)
    paths = kitti.write_kitti_sequence(tmp_path, "00", Lu, Ru, calib)
    lp = sorted(paths.left_dir.glob("*.png"))
    rp = sorted(paths.right_dir.glob("*.png"))
    ck = tmp_path / "fe_ckpt.npz"

    # interrupted run: first 4 frames only, checkpointed
    ppipe.run_frontend_pipelined(lp[:4], rp[:4], (128, 256), calib, CFG,
                                 checkpoint_path=str(ck), checkpoint_every=4)
    assert ck.exists()
    # resumed run over the full sequence continues from frame 4 and must be
    # bit-identical to an uninterrupted one (position-based key stream)
    res_resumed = ppipe.run_frontend_pipelined(
        lp, rp, (128, 256), calib, CFG,
        checkpoint_path=str(ck), checkpoint_every=4, resume=True)
    res_full = ppipe.run_frontend_pipelined(lp, rp, (128, 256), calib, CFG)
    np.testing.assert_array_equal(res_resumed.xy, res_full.xy)
    np.testing.assert_array_equal(res_resumed.T_w2c, res_full.T_w2c)
    np.testing.assert_array_equal(res_resumed.inlier_prev,
                                  res_full.inlier_prev)
    # pure-load rerun (checkpoint now covers everything)
    res_loaded = ppipe.run_frontend_pipelined(
        lp, rp, (128, 256), calib, CFG,
        checkpoint_path=str(ck), resume=True)
    np.testing.assert_array_equal(res_loaded.T_w2c, res_full.T_w2c)
    # descriptors were dropped from the checkpoint: the bank must
    # recompute them from the on-disk PNGs on demand
    d_loaded = np.asarray(res_loaded.desc[2])
    d_full = np.asarray(res_full.desc[2])
    np.testing.assert_allclose(d_loaded, d_full, atol=2e-3)


@pytest.mark.slow
def test_cli_kitti_multires_batch(tmp_path):
    """Two on-disk sequences at different resolutions through the CLI:
    bucket padding + (when available) the native prefetcher + reports."""
    from slam_tpu.__main__ import main

    root = tmp_path / "dataset"
    Lu0, Ru0, calib0, gt0 = _scene_u8(14, frames=8, hw=(128, 256))
    Lu1, Ru1, calib1, gt1 = _scene_u8(15, frames=8, hw=(120, 248))
    kitti.write_kitti_sequence(root, "00", Lu0, Ru0, calib0, gt0)
    kitti.write_kitti_sequence(root, "01", Lu1, Ru1, calib1, gt1)

    cfg_path = tmp_path / "cfg.json"
    CFG.save(cfg_path)
    out = tmp_path / "run"
    rc = main([
        "--kitti-root", str(root), "--seq", "00", "01",
        "--out", str(out), "--config", str(cfg_path),
        "--no-loop-closure", "--no-analysis", "--cpu",
    ])
    assert rc == 0
    reports = json.loads((out / "reports.json").read_text())
    assert set(reports) == {"00", "01"}
    for rep in reports.values():
        assert rep["frontend"]["ate_rmse_m"] < 1.0
