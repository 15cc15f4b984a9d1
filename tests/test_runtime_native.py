"""Native C++ runtime: track chaining parity, PNG decode, prefetcher."""

import numpy as np
import pytest

from slam_tpu import runtime
from slam_tpu.models.trackstore import TrackStore

pytestmark = pytest.mark.skipif(
    not runtime._load(), reason="native toolchain unavailable"
)


def random_frontend(F=30, K=64, seed=0):
    rng = np.random.default_rng(seed)

    class FE:
        pass

    fe = FE()
    fe.links = rng.uniform(0, 100, (F, K, 3)).astype(np.float32)
    fe.links[..., 1] = fe.links[..., 0] - 5.0
    fe.link_valid = np.ones((F, K), bool)
    fe.xy = rng.uniform(0, 100, (F, K, 2)).astype(np.float32)
    fe.inlier_frac = np.full(F, 0.8, np.float32)
    # random injective matches per frame
    fe.match_prev = np.full((F, K), -1, np.int32)
    fe.inlier_prev = np.zeros((F, K), bool)
    for f in range(1, F):
        perm = rng.permutation(K)
        n = rng.integers(K // 4, K // 2)
        cur = rng.choice(K, n, replace=False)
        fe.match_prev[f, cur] = perm[:n]
        fe.inlier_prev[f, cur] = rng.random(n) > 0.2
    return fe


def test_build_tracks_matches_python():
    fe = random_frontend()
    tids_cpp, n_cpp = runtime.build_tracks(fe.match_prev, fe.inlier_prev)
    db_py = TrackStore.from_frontend(fe, use_native=False)
    assert n_cpp == db_py.num_tracks
    np.testing.assert_array_equal(tids_cpp, db_py.track_ids)


def test_png_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((48, 72)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    try:
        import cv2

        cv2.imwrite(str(p), img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(p)
    out = runtime.load_png_gray(p)
    assert out.shape == (48, 72)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_prefetcher_streams_chunks(tmp_path):
    import cv2

    F, H, W = 10, 32, 40
    lps, rps = [], []
    for i in range(F):
        l = np.full((H, W), i * 20, np.uint8)
        r = np.full((H, W), i * 20 + 5, np.uint8)
        lp = tmp_path / f"l{i:03d}.png"
        rp = tmp_path / f"r{i:03d}.png"
        cv2.imwrite(str(lp), l)
        cv2.imwrite(str(rp), r)
        lps.append(lp)
        rps.append(rp)

    pf = runtime.StereoPrefetcher(lps, rps, H, W, chunk=4)
    got = []
    for L, R in pf:
        got.append((L.copy(), R.copy()))
    total = sum(l.shape[0] for l, _ in got)
    assert total == F
    # values in order
    k = 0
    for L, R in got:
        for f in range(L.shape[0]):
            np.testing.assert_allclose(L[f], k * 20 / 255.0, atol=1e-6)
            np.testing.assert_allclose(R[f], (k * 20 + 5) / 255.0, atol=1e-6)
            k += 1


@pytest.mark.slow
def test_tsan_prefetcher_clean():
    """ThreadSanitizer gate on the threaded prefetcher (SURVEY §5 race
    detection: the reference has no threads; this runtime does, so it
    gets a sanitizer run — scripts/tsan_native.py)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(root / "scripts/tsan_native.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
