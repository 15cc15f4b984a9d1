"""Descriptor-path benchmark: harris 1-octave vs harris 2-octave vs AKAZE.

VERDICT r1 item 8 / NOTES_ROUND1 §2: a second descriptor octave helps
loop-closure viewpoint changes but was never made the measured default.
This driver runs the full pipeline on the SAME rendered loop scene for
each detector configuration and reports:

  * frontend fps (chunked steady-state, this machine's device)
  * loop closures found + median verification inliers
  * ATE at every backend stage

Usage:  python scripts/bench_descriptors.py [--frames 200] [--out /tmp/descbench]
The summary table is printed and written to <out>/summary.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--out", type=Path, default=Path("/tmp/descbench"))
    ap.add_argument("--hw", type=int, nargs=2, default=[376, 1241])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from slam_tpu import pipeline as pipeline_mod
    from slam_tpu.config import FeatureConfig, SlamConfig
    from slam_tpu.utils import synthetic

    args.out.mkdir(parents=True, exist_ok=True)
    # one loop scene with a revisit, shared by every variant
    scene = synthetic.make_scene(
        jax.random.PRNGKey(0), num_frames=args.frames,
        num_landmarks=max(8000, args.frames * 40), trajectory="clover",
        hw=tuple(args.hw),
        clover_radii=(args.frames / (4 * np.pi) * 0.9,
                      args.frames / (4 * np.pi) * 1.1),
        corridor_halfwidth=15.0,
    )
    scene = synthetic.host_scene(scene)
    L, R = synthetic.render_sequence(scene)
    u8 = lambda x: np.clip(x * 255, 0, 255).astype(np.uint8)
    L, R = u8(L), u8(R)
    T_gt = np.asarray(scene.T_w2c)
    calib = np.asarray(scene.calib)

    variants = {
        "harris1": FeatureConfig(),
        "harris2": FeatureConfig(num_levels=2),
        "akaze": FeatureConfig(detector="akaze", num_levels=2),
    }
    summary = {}
    for name, feat in variants.items():
        cfg = SlamConfig(features=feat)
        t0 = time.perf_counter()
        res = pipeline_mod.run_pipeline(L, R, calib, cfg,
                                        run_loop_closure=True, verbose=False)
        wall = time.perf_counter() - t0
        rep = pipeline_mod.evaluate(res, T_gt)
        inl = [c.num_inliers for c in res.closures]
        summary[name] = {
            "wall_s": round(wall, 1),
            "frontend_s": round(res.timings.get("frontend", 0.0), 1),
            "frontend_fps": round(args.frames / max(
                res.timings.get("frontend", 1e-9), 1e-9), 1),
            "num_closures": len(res.closures),
            "closure_inliers_median": float(np.median(inl)) if inl else 0.0,
            "ate": {k: round(v["ate_rmse_m"], 4) for k, v in rep.items()
                    if isinstance(v, dict) and "ate_rmse_m" in v},
            "median_frame_inliers": float(np.median(res.frontend.num_inliers[1:])),
            "pose_failures": rep["num_pose_failures"],
        }
        print(f"[descbench] {name}: "
              + json.dumps(summary[name]), flush=True)
        cfg.save(args.out / f"config_{name}.json")

    (args.out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
