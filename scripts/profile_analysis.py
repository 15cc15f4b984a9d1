"""Profile the analysis stage from existing scale-run artifacts (host-only).

Reconstructs the PipelineResult exactly as scripts/scale_run.py stage 7
does, then cProfiles utils/analysis.run_analysis to show where the
stage's wall-clock goes (matplotlib rendering vs numeric computation).

    JAX_PLATFORMS=cpu python scripts/profile_analysis.py --out runs/scale
"""

from __future__ import annotations

import argparse
import cProfile
import io
import json
import pstats
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("runs/scale"))
    ap.add_argument("--graphs", type=Path, default=None,
                    help="plot output dir (default <out>/graphs_profile)")
    args = ap.parse_args()
    out: Path = args.out

    from slam_tpu import pipeline as pipeline_mod
    from slam_tpu.config import SlamConfig
    from slam_tpu.models import bundle as bundle_mod
    from slam_tpu.models import frontend as frontend_mod
    from slam_tpu.models.pose_graph import PoseGraph
    from slam_tpu.models.trackstore import TrackStore
    from slam_tpu.utils import analysis

    cfg = SlamConfig.load(out / "config.json")
    calib = np.load(out / "calib.npy")
    T_gt = np.load(out / "gt_T_w2c.npy")
    images_L = np.load(out / "images_L.npy", mmap_mode="r")

    t0 = time.perf_counter()
    fe = frontend_mod.run_frontend(
        images_L, np.load(out / "images_R.npy", mmap_mode="r"), calib, cfg,
        checkpoint_path=str(out / "frontend_ckpt.npz"), resume=True,
    )
    print(f"frontend checkpoint load: {time.perf_counter() - t0:.1f}s")
    db = TrackStore.load(out / "trackstore.npz")
    bundles = bundle_mod.load_bundles(out / "bundles.npz")
    pg_pre = PoseGraph.load(out / "pose_graph.npz")
    pg_lc = PoseGraph.load(out / "pose_graph_lc.npz")
    closures_meta = json.loads((out / "closures.json").read_text())

    class _C:
        def __init__(self, d):
            self.__dict__.update(d)

    result = pipeline_mod.PipelineResult(
        frontend=fe, db=db, bundles=bundles,
        pose_graph=pg_lc, pose_graph_pre_lc=pg_pre,
        closures=[_C(c) for c in closures_meta], timings={},
        calib=np.asarray(calib, np.float32),
    )
    graphs = args.graphs or (out / "graphs_profile")

    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    analysis.run_analysis(result, T_gt, graphs, images_left=images_L)
    prof.disable()
    print(f"run_analysis: {time.perf_counter() - t0:.1f}s")

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(35)
    print(s.getvalue())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
