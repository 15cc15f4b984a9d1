"""End-to-end SLAM pipeline driver.

Reference surface: final_project/project.py — ``run_project`` (:27-94)
stage orchestration with per-stage artifact caching (:29-91) and the
``__main__`` entry (:97-107). Stages:

  1. frontend odometry  -> FrontendResult        (ref: tracking DB stage)
  2. track store        -> TrackStore
  3. windowed BA        -> BundleResult          (ref: bundles stage)
  4. pose graph         -> PoseGraph             (ref: pose-graph stage)
  5. loop closure       -> PoseGraph + closures  (ref: LC stage)
  6. analysis           -> metrics dict + plots  (ref: run_analysis)

Artifacts are npz/JSON files in a cache directory (replacing the
reference's pickles); every stage can be loaded instead of recomputed.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .config import SlamConfig
from .models import bundle as bundle_mod
from .models import frontend as frontend_mod
from .models import loop_closure as lc_mod
from .models.pose_graph import PoseGraph
from .models.trackstore import TrackStore
from .utils import metrics


@dataclass
class PipelineResult:
    frontend: frontend_mod.FrontendResult
    db: TrackStore
    bundles: bundle_mod.BundleResult
    pose_graph: PoseGraph          # after loop closure
    pose_graph_pre_lc: PoseGraph   # before loop closure
    closures: list
    timings: dict = field(default_factory=dict)
    calib: np.ndarray | None = None

    # trajectories (extrinsics per frame / keyframe)
    @property
    def T_frontend(self) -> np.ndarray:
        return self.frontend.T_w2c

    @property
    def T_bundled_frames(self) -> np.ndarray:
        return bundle_mod.frame_poses_from_bundles(
            self.bundles, self.db.num_frames
        )

    def keyframe_trajectory(self, graph: PoseGraph | None = None) -> np.ndarray:
        g = self.pose_graph if graph is None else graph
        return g.nodes


def run_pipeline(
    images_left: np.ndarray,
    images_right: np.ndarray,
    calib,
    cfg: SlamConfig = SlamConfig(),
    cache_dir: str | Path | None = None,
    run_loop_closure: bool = True,
    verbose: bool = True,
    mesh=None,
    overlap: bool = False,
    image_hw: tuple[int, int] | None = None,
) -> PipelineResult:
    """The full pipeline (reference run_project, project.py:27-94).

    ``images_left``/``images_right`` are either in-memory (F, H, W) arrays
    or **lists of PNG paths** — with paths the frontend streams from disk
    through the native prefetcher (parallel/pipeline.py: C++ decode threads
    overlap device compute), which is how on-disk KITTI sequences should be
    driven. ``image_hw`` gives the decode/bucket shape for the path mode
    (defaults to the first image's size); smaller images are
    edge-replicate-padded to it.

    With ``mesh`` (a jax.sharding.Mesh) the frontend shards the frame axis
    and bundle adjustment shards the window axis across the devices
    (parallel/sharded_frontend.py, parallel/sharded_ba.py). With
    ``overlap=True`` (requires ``mesh``) the mesh is split into frontend /
    backend stage groups and bundle adjustment runs concurrently with the
    frontend (parallel/stage_overlap.py — pipeline parallelism). Both
    require in-memory arrays.
    """
    from .config import enable_compile_cache

    enable_compile_cache(cfg.runtime)
    timings = {}
    log = print if verbose else (lambda *a, **k: None)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = time.perf_counter() - t0
        log(f"[pipeline] {name}: {timings[name]:.2f}s")
        return out

    cache = Path(cache_dir) if cache_dir else None
    # Stage-load semantics of the reference driver (project.py:29-91: each
    # of DB / bundles / pose-graph / LC pose-graph is loaded from disk
    # instead of recomputed when its artifact exists). A stage artifact is
    # reused only while every upstream stage was also reused AND the cached
    # config matches — a changed config or a recomputed upstream stage
    # invalidates everything downstream.
    from_disk = isinstance(images_left, (list, tuple))
    reuse = False
    if cache:
        import hashlib

        # the reuse key is config + an input fingerprint: stage artifacts
        # from a different sequence (or a different --limit of the same
        # one) must not be served against this run's frontend
        h = hashlib.sha256()
        if from_disk:
            # path strings alone are not enough: a regenerated dataset
            # with the same filenames must invalidate, so each file's
            # (size, mtime) joins the key
            import os

            h.update("\n".join(map(str, images_left)).encode())
            h.update("\n".join(map(str, images_right)).encode())
            for p in (images_left[0], images_left[-1], images_right[0],
                      images_right[-1]):
                st = os.stat(p)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        else:
            h.update(np.asarray(images_left[0]).tobytes())
            h.update(np.asarray(images_left[-1]).tobytes())
            h.update(np.asarray(images_right[0]).tobytes())
        fingerprint = json.dumps(
            {"frames": int(len(images_left)), "sha": h.hexdigest()})

        cache.mkdir(parents=True, exist_ok=True)
        cfg_file = cache / "config.json"
        fp_file = cache / "inputs.json"
        reuse = (
            cfg_file.exists() and cfg_file.read_text() == cfg.to_json()
            and fp_file.exists() and fp_file.read_text() == fingerprint
        )
        if not reuse:
            cfg.save(cfg_file)
            fp_file.write_text(fingerprint)

    def stage(name, artifact, compute, load, save):
        """Load ``artifact`` if the reuse chain holds, else compute+save.
        Breaks the chain (nonlocal reuse) on recompute."""
        nonlocal reuse
        if cache and reuse and (cache / artifact).exists():
            out = timed(name, lambda: load(cache / artifact))
            log(f"[pipeline] {name}: loaded from cache")
            return out
        reuse = False
        out = timed(name, compute)
        if cache:
            save(out, cache / artifact)
        return out

    if from_disk and (mesh is not None or overlap):
        raise ValueError("mesh/overlap modes require in-memory image arrays")

    # stages 1-3: frontend + track store + bundles
    if from_disk:
        from .parallel.pipeline import run_frontend_pipelined
        from .utils.kitti import _imread_gray

        if image_hw is None:
            image_hw = _imread_gray(Path(images_left[0])).shape
        # same incremental-checkpoint semantics as the in-memory branch: a
        # complete checkpoint turns reruns into a pure load (no image IO)
        fe = timed("frontend", lambda: run_frontend_pipelined(
            list(images_left), list(images_right), image_hw, calib, cfg,
            checkpoint_path=(
                str(cache / "frontend_ckpt.npz") if cache else None),
            resume=bool(cache and reuse)))
        db = stage(
            "trackstore", "trackstore.npz",
            lambda: TrackStore.from_frontend(fe),
            TrackStore.load, lambda o, p: o.save(p))
        bundles = stage(
            "bundles", "bundles.npz",
            lambda: bundle_mod.run_bundles(db, fe.T_w2c, calib, cfg),
            bundle_mod.load_bundles, bundle_mod.save_bundles)
    elif overlap and mesh is not None:
        # pipeline parallelism: frontend stage group ‖ BA stage group
        # (parallel/stage_overlap.py); one timing bucket since the stages
        # genuinely run concurrently
        from .parallel.stage_overlap import run_pipeline_overlapped

        reuse = False
        fe, db, bundles = timed("frontend+bundles_overlapped",
                                lambda: run_pipeline_overlapped(
                                    images_left, images_right, calib, cfg,
                                    mesh=mesh))
        if cache:
            db.save(cache / "trackstore.npz")
    else:
        if mesh is not None:
            from .parallel.sharded_frontend import run_frontend_sharded

            reuse = False
            fe = timed("frontend", lambda: run_frontend_sharded(
                images_left, images_right, calib, mesh, cfg))
        else:
            # the frontend reuses its own incremental checkpoint (exact
            # resume, bit-identical to an uninterrupted run) — a complete
            # checkpoint makes this stage a pure load on reruns
            fe = timed("frontend", lambda: frontend_mod.run_frontend(
                images_left, images_right, calib, cfg,
                checkpoint_path=(
                    str(cache / "frontend_ckpt.npz") if cache else None),
                resume=bool(cache and reuse)))
        db = stage(
            "trackstore", "trackstore.npz",
            lambda: TrackStore.from_frontend(fe),
            TrackStore.load, lambda o, p: o.save(p))

        bundles = stage(
            "bundles", "bundles.npz",
            lambda: bundle_mod.run_bundles(db, fe.T_w2c, calib, cfg,
                                           mesh=mesh),
            bundle_mod.load_bundles, bundle_mod.save_bundles)

    # stage 4: pose graph
    def _pg():
        g = PoseGraph.from_bundles(bundles)
        g.optimize()
        return g

    pg = stage("pose_graph", "pose_graph.npz", _pg,
               PoseGraph.load, lambda o, p: o.save(p))
    pg_pre = _copy_pg(pg)

    # stage 5: loop closure
    closures = []
    if run_loop_closure:
        lc_file = cache / "pose_graph_lc.npz" if cache else None
        cl_file = cache / "closures.npz" if cache else None
        if cache and reuse and lc_file.exists() and cl_file.exists():
            t0 = time.perf_counter()
            pg = PoseGraph.load(lc_file)
            closures = lc_mod.load_closures(cl_file)
            timings["loop_closure"] = time.perf_counter() - t0
            log(f"[pipeline] loop_closure: loaded from cache "
                f"({timings['loop_closure']:.2f}s)")
        else:
            closures = timed("loop_closure", lambda: lc_mod.find_loops(
                pg, db, fe.desc, fe.valid, calib, cfg))
            if cache:
                pg.save(lc_file)
                lc_mod.save_closures(closures, cl_file)
        log(f"[pipeline] {len(closures)} loop closures: "
            f"{[(c.frame_i, c.frame_j, c.num_inliers) for c in closures]}")

    return PipelineResult(
        frontend=fe, db=db, bundles=bundles,
        pose_graph=pg, pose_graph_pre_lc=pg_pre,
        closures=closures, timings=timings,
        calib=np.asarray(calib, np.float32),
    )


def _copy_pg(pg: PoseGraph) -> PoseGraph:
    out = PoseGraph()
    out.nodes = pg.nodes.copy()
    out.keyframes = list(pg.keyframes)
    out.e_i, out.e_j = pg.e_i.copy(), pg.e_j.copy()
    out.Z, out.sqrt_info = pg.Z.copy(), pg.sqrt_info.copy()
    out.is_loop = pg.is_loop.copy()
    return out


def evaluate(result: PipelineResult, T_gt: np.ndarray) -> dict:
    """Stage-by-stage accuracy summary vs ground truth (the numeric core of
    reference run_analysis, analysis.py:1277-1362)."""
    kfs = result.pose_graph.keyframes
    gt_kf = T_gt[kfs]
    out = {
        "frontend": metrics.trajectory_summary(result.T_frontend, T_gt),
        "bundles_kf": metrics.trajectory_summary(
            result.bundles.T_w2c_keyframes, gt_kf),
        "pose_graph_kf": metrics.trajectory_summary(
            result.pose_graph_pre_lc.nodes, gt_kf),
        "num_closures": len(result.closures),
        "num_pose_failures": result.frontend.num_pose_failures,
        "timings_s": result.timings,
        "db_stats": result.db.stats(),
        # capacity accounting: observations build_windows had to cut to fit
        # max_obs (the reference keeps every factor, bundle.py:129-169 —
        # this records the static-shape price at scale)
        "bundle_obs_dropped": int(result.bundles.obs_dropped),
        "bundle_obs_total": int(result.bundles.obs_total),
        "bundle_obs_drop_rate": (
            float(result.bundles.obs_dropped / result.bundles.obs_total)
            if result.bundles.obs_total else 0.0),
    }
    if result.closures:
        out["pose_graph_lc_kf"] = metrics.trajectory_summary(
            result.pose_graph.nodes, gt_kf)
    return out


def save_report(path: str | Path, report: dict) -> None:
    Path(path).write_text(json.dumps(report, indent=2, default=float))
