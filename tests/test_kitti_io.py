"""KITTI IO tests against a synthesized mini-dataset on disk."""

import numpy as np
import pytest

from slam_tpu.utils import kitti


@pytest.fixture
def fake_kitti(tmp_path):
    root = tmp_path / "dataset"
    seq = root / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (root / "poses").mkdir(parents=True)

    fx, fy, cx, cy, b = 718.856, 718.856, 607.1928, 185.2157, 0.5372
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    P0 = K @ np.eye(3, 4)
    P1 = K @ np.hstack([np.eye(3), [[-b], [0], [0]]])
    lines = [
        "P0: " + " ".join(f"{v:.12e}" for v in P0.ravel()),
        "P1: " + " ".join(f"{v:.12e}" for v in P1.ravel()),
    ]
    (seq / "calib.txt").write_text("\n".join(lines))

    # 3 frames of tiny images
    try:
        import cv2

        for i in range(3):
            img = (np.random.default_rng(i).random((40, 60)) * 255).astype(
                np.uint8
            )
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), img)
            cv2.imwrite(str(seq / "image_1" / f"{i:06d}.png"), img)
    except ImportError:
        from PIL import Image

        for i in range(3):
            img = (np.random.default_rng(i).random((40, 60)) * 255).astype(
                np.uint8
            )
            Image.fromarray(img).save(seq / "image_0" / f"{i:06d}.png")
            Image.fromarray(img).save(seq / "image_1" / f"{i:06d}.png")

    # ground-truth poses: forward motion, cam->world rows
    rows = []
    for i in range(3):
        T = np.eye(4)
        T[2, 3] = float(i)  # camera at z = i in world
        rows.append(T[:3].ravel())
    (root / "poses" / "00.txt").write_text(
        "\n".join(" ".join(f"{v:.6e}" for v in r) for r in rows)
    )
    return kitti.KittiPaths(root=root, sequence="00")


def test_paths_and_count(fake_kitti):
    assert fake_kitti.exists()
    assert kitti.num_frames(fake_kitti) == 3


def test_calibration_roundtrip(fake_kitti):
    K, M1, M2, b = kitti.read_calibration(fake_kitti)
    np.testing.assert_allclose(K[0, 0], 718.856, rtol=1e-6)
    np.testing.assert_allclose(b, 0.5372, rtol=1e-5)
    np.testing.assert_allclose(M1, np.eye(3, 4), atol=1e-9)
    cv = kitti.calib_vector(fake_kitti)
    np.testing.assert_allclose(
        cv, [718.856, 718.856, 607.1928, 185.2157, 0.5372], rtol=1e-5
    )


def test_ground_truth_extrinsics(fake_kitti):
    T = kitti.read_ground_truth(fake_kitti)
    assert T.shape == (3, 4, 4)
    # camera center of frame 2 should be (0, 0, 2)
    from slam_tpu.utils.metrics import camera_centers

    np.testing.assert_allclose(camera_centers(T)[2], [0, 0, 2], atol=1e-5)


def test_read_kth_camera(fake_kitti):
    T2 = kitti.read_kth_camera(fake_kitti, 2)
    from slam_tpu.utils.metrics import camera_centers

    np.testing.assert_allclose(camera_centers(T2[None])[0], [0, 0, 2],
                               atol=1e-5)


def test_image_loading(fake_kitti):
    L, R, calib, gt = kitti.load_sequence(fake_kitti)
    assert L.shape == (3, 40, 60) and R.shape == (3, 40, 60)
    assert L.dtype == np.float32
    assert 0.0 <= L.min() and L.max() <= 1.0
    assert gt.shape == (3, 4, 4)


# ---------------------------------------------------------------------------
# real on-disk formats (committed fixtures with the genuine seq-00 calib
# text: P0..P3 + Tr lines, scientific notation — reference Inputs.py:22-64)
# ---------------------------------------------------------------------------

DATA = __import__("pathlib").Path(__file__).parent / "data"


@pytest.fixture
def real_format_kitti(tmp_path):
    root = tmp_path / "dataset"
    seq = root / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (root / "poses").mkdir(parents=True)
    (seq / "calib.txt").write_text((DATA / "calib_real_00.txt").read_text())
    (root / "poses" / "00.txt").write_text(
        (DATA / "poses_real_00.txt").read_text()
    )
    return kitti.KittiPaths(root=root, sequence="00")


def test_real_calib_format(real_format_kitti):
    """The genuine seq-00 calib.txt (4 cameras + Tr velodyne line) parses
    to the known intrinsics; baseline comes from P1's -fx*b column."""
    K, M1, M2, b = kitti.read_calibration(real_format_kitti)
    np.testing.assert_allclose(K[0, 0], 718.856, rtol=1e-9)
    np.testing.assert_allclose(K[0, 2], 607.1928, rtol=1e-9)
    np.testing.assert_allclose(K[1, 2], 185.2157, rtol=1e-9)
    np.testing.assert_allclose(b, 386.1448 / 718.856, rtol=1e-9)
    np.testing.assert_allclose(M1[:, :3], np.eye(3), atol=1e-12)


def test_real_calib_missing_lines(tmp_path):
    seq = tmp_path / "sequences" / "00"
    seq.mkdir(parents=True)
    (seq / "calib.txt").write_text("Tr: " + " ".join(["0"] * 12))
    with pytest.raises(ValueError, match="P0/P1"):
        kitti.read_calibration(kitti.KittiPaths(root=tmp_path))


def test_real_poses_format(real_format_kitti):
    """Real poses rows (12 scientific-notation floats, cam->world) invert
    to extrinsics; frame 0 sits at the origin and motion is forward."""
    T = kitti.read_ground_truth(real_format_kitti)
    assert T.shape == (5, 4, 4)
    from slam_tpu.utils.metrics import camera_centers

    c = camera_centers(T)
    np.testing.assert_allclose(c[0], 0.0, atol=1e-9)
    assert np.all(np.diff(c[:, 2]) > 0.5)  # forward ~0.86 m/frame


# ---------------------------------------------------------------------------
# mixed image sizes -> shared compiled shapes (KITTI 00: 1241x376 vs
# 04-12: 1226x370; reference loads native sizes, Inputs.py:8-19)
# ---------------------------------------------------------------------------

def test_bucket_for_and_padding():
    bucket = kitti.bucket_for([(376, 1241), (370, 1226), (375, 1242)])
    assert bucket == (376, 1248)
    imgs = np.random.default_rng(0).random((2, 370, 1226)).astype(np.float32)
    padded = kitti.pad_to_bucket(imgs, bucket)
    assert padded.shape == (2, 376, 1248)
    np.testing.assert_array_equal(padded[:, :370, :1226], imgs)
    # padding is edge-replicated (flat, detector-quiet), not a zero step
    np.testing.assert_array_equal(padded[:, 370:, :1226],
                                  np.repeat(imgs[:, 369:370, :], 6, axis=1))
    np.testing.assert_array_equal(padded[:, :, 1226:],
                                  np.repeat(padded[:, :, 1225:1226], 22,
                                            axis=2))
    with pytest.raises(ValueError):
        kitti.pad_to_bucket(imgs, (256, 1024))


@pytest.mark.slow
def test_multi_sequence_shared_bucket_runs():
    """Two synthetic sequences at DIFFERENT resolutions run through
    run_multi_sequence under one shared padded shape (the multi-seq
    kernel-reuse path, parallel/pipeline.py)."""
    import jax

    from slam_tpu.config import FeatureConfig, RansacConfig, SlamConfig
    from slam_tpu.parallel.pipeline import run_multi_sequence
    from slam_tpu.utils import synthetic

    cfg = SlamConfig(
        features=FeatureConfig(max_kp=256, border=8),
        ransac=RansacConfig(num_hypotheses=128, min_inliers=6),
    )
    seqs = {}
    for name, hw in [("a", (96, 160)), ("b", (90, 150))]:
        scene = synthetic.make_scene(
            jax.random.PRNGKey(3), num_frames=8, num_landmarks=1500,
            trajectory="straight", hw=hw, step_m=0.5,
        )
        L, R = synthetic.render_sequence(scene)
        seqs[name] = (L, R, np.asarray(scene.calib),
                      np.asarray(scene.T_w2c))
    reports = run_multi_sequence(seqs, cfg, run_loop_closure=False)
    assert set(reports) == {"a", "b"}
    for rep in reports.values():
        assert rep["frontend"]["ate_rmse_m"] < 1.0
