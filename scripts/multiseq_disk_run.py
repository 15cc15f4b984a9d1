"""BASELINE config #5: multi-sequence batched run from on-disk KITTI trees.

The reference's batch story is "run project.py per KITTI sequence from
disk" (arguments.py:12-14 hard-codes the paths; Inputs.py:8-64 reads the
layout). This driver executes the batched equivalent end-to-end on the
real device: it renders N synthetic loop sequences at DIFFERENT
resolutions, writes them in KITTI odometry's exact on-disk layout
(utils/kitti.write_kitti_sequence), then drives the CLI once over all of
them — shared resolution bucket, native C++ PNG prefetcher, loop
closure, analysis, per-sequence reports.

Usage:  python scripts/multiseq_disk_run.py [--frames 250] [--out runs/multiseq]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--out", type=Path, default=Path("runs/multiseq"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from slam_tpu.__main__ import main as cli_main
    from slam_tpu.utils import kitti, synthetic

    out: Path = args.out
    root = out / "dataset"
    # two loop scenes at KITTI-like but different resolutions: the batch
    # must bucket-pad them to one compiled shape (reference sequences
    # 00/02/05/08 differ in resolution the same way)
    specs = [("00", 7, (376, 1241)), ("01", 11, (370, 1226))]
    t_render = time.perf_counter()
    for seq, key, hw in specs:
        if (root / "sequences" / seq / "calib.txt").exists():
            continue
        scene = synthetic.make_scene(
            jax.random.PRNGKey(key), num_frames=args.frames,
            num_landmarks=20_000, trajectory="loop", hw=hw, step_m=1.0,
        )
        L, R = synthetic.render_sequence(scene)
        u8 = lambda x: np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)
        kitti.write_kitti_sequence(root, seq, u8(L), u8(R),
                                   np.asarray(scene.calib),
                                   np.asarray(scene.T_w2c))
        print(f"[multiseq] wrote {seq} {hw} x{args.frames}", flush=True)
    t_render = time.perf_counter() - t_render

    t0 = time.perf_counter()
    rc = cli_main([
        "--kitti-root", str(root), "--seq", "00", "01",
        "--out", str(out / "run"),
    ] + (["--cpu"] if args.cpu else []))
    wall = time.perf_counter() - t0
    if rc != 0:
        print(f"[multiseq] CLI failed rc={rc}")
        return rc

    reports = json.loads((out / "run" / "reports.json").read_text())
    summary = {
        "render_s": round(t_render, 1),
        "batch_wall_s": round(wall, 1),
        "frames_total": 2 * args.frames,
        "e2e_fps": round(2 * args.frames / wall, 2),
        "sequences": {
            k: {
                "ate_frontend_m": r["frontend"]["ate_rmse_m"],
                "ate_final_m": r.get("pose_graph_lc_kf",
                                     r["pose_graph_kf"])["ate_rmse_m"],
                "closures": r["num_closures"],
                "pose_failures": r["num_pose_failures"],
            }
            for k, r in reports.items()
        },
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
