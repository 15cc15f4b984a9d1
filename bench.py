"""Benchmark: frontend visual-odometry throughput on KITTI-shaped stereo.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

The measured quantity is the per-frame hot path of the reference
(SURVEY.md §3.2: detect + describe both stereo images, stereo match,
temporal match, triangulate, RANSAC-PnP pose) at KITTI seq-00 resolution
(376 x 1241), steady-state, on whatever device JAX provides (the real TPU
chip under the driver).

``vs_baseline`` divides by the CPU reference cost, measured live with the
same C++ kernels the reference binds (cv2 SIFT detect/compute + three
crossCheck BFMatcher passes + per-point SVD triangulation + EPnP-RANSAC
loop with adaptive iteration count, matching
final_project/backend/database/database.py:30-89 + algorithms/ransac.py).
"""

from __future__ import annotations

import json
import time

import numpy as np

H, W = 376, 1241
BENCH_FRAMES = 48
CHUNK = 8
BASELINE_FRAMES = 4


def make_images(num_frames: int) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic KITTI-resolution stereo sequence (rendered blob scene)."""
    import jax

    from slam_tpu.utils import synthetic

    scene = synthetic.make_scene(
        jax.random.PRNGKey(0), num_frames=num_frames, num_landmarks=12000,
        hw=(H, W), step_m=1.0,
    )
    L, R = synthetic.render_sequence(scene)
    # uint8, as KITTI ships them — quarters the host->device transfer
    to_u8 = lambda x: np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8)
    return to_u8(L), to_u8(R)


def bench_tpu(L: np.ndarray, R: np.ndarray) -> float:
    """Steady-state frames/sec of the chunked frontend."""
    import jax
    import jax.numpy as jnp

    from slam_tpu.config import SlamConfig
    from slam_tpu.models import frontend
    from slam_tpu.utils.synthetic import KITTI_CALIB

    cfg = SlamConfig()
    calib = jnp.asarray(KITTI_CALIB)
    key = jax.random.PRNGKey(0)

    Lj = jnp.asarray(L)
    Rj = jnp.asarray(R)

    # warmup: compile both carry variants
    out, carry = frontend.process_chunk(Lj[:CHUNK], Rj[:CHUNK], None, calib,
                                        key, cfg)
    out2, carry = frontend.process_chunk(Lj[CHUNK:2 * CHUNK],
                                         Rj[CHUNK:2 * CHUNK], carry, calib,
                                         key, cfg)
    jax.block_until_ready(out2["T_rel"])

    n_chunks = (L.shape[0] - CHUNK) // CHUNK
    t0 = time.perf_counter()
    c = carry
    last = None
    for i in range(1, 1 + n_chunks):
        s = i * CHUNK
        o, c = frontend.process_chunk(Lj[s : s + CHUNK], Rj[s : s + CHUNK],
                                      c, calib, key, cfg)
        last = o
    jax.block_until_ready(last["T_rel"])
    dt = time.perf_counter() - t0
    return n_chunks * CHUNK / dt


def bench_cpu_reference(L: np.ndarray, R: np.ndarray) -> float:
    """Frames/sec of the reference's per-frame hot path on CPU via the same
    native libraries the reference binds (OpenCV). Returns 0.0 if cv2 is
    unavailable."""
    try:
        import cv2
    except Exception:
        return 0.0

    sift = cv2.SIFT_create(nfeatures=2500)
    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=True)
    K = np.array([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]])
    Pm = K @ np.eye(3, 4)
    Qm = K @ np.hstack([np.eye(3), [[-0.5372], [0.0], [0.0]]])

    imgs = [(np.clip(L[i] * 255, 0, 255).astype(np.uint8),
             np.clip(R[i] * 255, 0, 255).astype(np.uint8))
            for i in range(BASELINE_FRAMES + 1)]

    prev = None
    t0 = time.perf_counter()
    for il, ir in imgs:
        kl, dl = sift.detectAndCompute(il, None)
        kr, dr = sift.detectAndCompute(ir, None)
        if dl is None or dr is None or len(kl) < 8 or len(kr) < 8:
            prev = None
            continue
        ms = bf.match(dl, dr)  # stereo match
        # rectified gate
        links = []
        for m in ms:
            pl, pr = kl[m.queryIdx].pt, kr[m.trainIdx].pt
            if abs(pl[1] - pr[1]) < 2 and pl[0] > pr[0] + 2:
                links.append((m.queryIdx, pl, pr))
        if prev is not None:
            pkl, pdl, plinks = prev
            bf.match(pdl, dl)   # forward
            bf.match(dl, pdl)   # backward (mutual filter cost)
            # triangulate previous links (per-point SVD, ref style)
            pts3 = []
            obs2 = []
            for qi, pl, pr in plinks[:600]:
                A = np.stack([
                    pl[0] * Pm[2] - Pm[0], pl[1] * Pm[2] - Pm[1],
                    pr[0] * Qm[2] - Qm[0], pr[1] * Qm[2] - Qm[1],
                ])
                _, _, Vt = np.linalg.svd(A)
                X = Vt[-1]
                pts3.append(X[:3] / X[3] if abs(X[3]) > 1e-9 else X[:3])
                obs2.append(pl)
            pts3 = np.asarray(pts3)
            obs2 = np.asarray(obs2, np.float64)
            # EPnP-RANSAC loop, adaptive-count scale (ref ransac.py:59-67)
            if len(pts3) >= 4:
                rng = np.random.default_rng(0)
                for _ in range(240):
                    idx = rng.choice(len(pts3), 4, replace=False)
                    cv2.solvePnP(pts3[idx], obs2[idx], K, None,
                                 flags=cv2.SOLVEPNP_EPNP)
        prev = (kl, dl, links)
    dt = time.perf_counter() - t0
    return BASELINE_FRAMES / dt if dt > 0 else 0.0


def main() -> None:
    L, R = make_images(BENCH_FRAMES)
    fps = bench_tpu(L, R)
    ref_fps = bench_cpu_reference(L, R)
    vs = fps / ref_fps if ref_fps > 0 else float("nan")
    print(json.dumps({
        "metric": "frontend_fps_kitti_stereo_376x1241",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
