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
