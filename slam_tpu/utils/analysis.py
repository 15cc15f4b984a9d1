"""Analysis / evaluation suite: plots + printed statistics.

Reference surface: final_project/analysis.py (1364 LoC, 25 named plots,
registry :27-67, driver run_analysis :1277-1362). This module regenerates
the same evaluation artifacts from the pipeline's SoA results:

  tracking statistics (ref :70-106)        -> printed + JSON
  connectivity (ref :109-132)              -> connectivity.png
  matches per frame (ref :135-152)         -> matches_per_frame.png
  inlier percent (ref :155-165)            -> inliers_percent.png
  track length histogram (ref :168-183)    -> track_lengths.png
  reprojection error vs track length
    (ref :340-439)                         -> reproj_vs_track_length.png
  trajectory overlay (ref :451-487)        -> trajectories.png
  absolute errors per stage (ref :508-670) -> abs_error_<stage>.png
  rotation errors (ref :490-505)           -> rot_error.png
  relative consecutive-keyframe error
    (ref :683-796)                         -> rel_consecutive.png
  KITTI-style sub-sequence errors
    (ref :801-920, :961-1075)              -> rel_subseq_<stage>.png
  uncertainty (log-det cov) vs keyframe
    (ref :1125-1263)                       -> uncertainty.png
  loop-closure edges on the trajectory     -> loops.png

All numeric results are also returned as one dict (and written to
analysis.json) — the regression surface against BASELINE.md.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from . import metrics


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _savefig(plt, out_dir: Path, name: str):
    plt.tight_layout()
    plt.savefig(out_dir / name, dpi=110)
    plt.close()


def plot_trajectories(out_dir, T_gt, stages: dict[str, np.ndarray]):
    """x-z overlay of every stage vs ground truth (ref :451-487)."""
    plt = _plt()
    plt.figure(figsize=(7, 6))
    c_gt = metrics.camera_centers(T_gt)
    plt.plot(c_gt[:, 0], c_gt[:, 2], "k-", lw=2, label="ground truth")
    for name, T in stages.items():
        c = metrics.camera_centers(T)
        plt.plot(c[:, 0], c[:, 2], lw=1, label=name)
    plt.xlabel("x [m]")
    plt.ylabel("z [m]")
    plt.axis("equal")
    plt.legend()
    plt.title("Trajectory overlay")
    _savefig(plt, out_dir, "trajectories.png")


def plot_abs_errors(out_dir, name, T_est, T_gt, x=None):
    """Per-axis + L2 absolute location error (ref :508-557)."""
    plt = _plt()
    err = metrics.abs_location_error(T_est, T_gt)
    x = np.arange(err.shape[0]) if x is None else x
    plt.figure(figsize=(8, 4))
    for i, lbl in enumerate(["x", "y", "z", "L2"]):
        plt.plot(x, err[:, i], label=lbl)
    plt.xlabel("frame")
    plt.ylabel("abs error [m]")
    plt.legend()
    plt.title(f"Absolute location error — {name}")
    _savefig(plt, out_dir, f"abs_error_{name}.png")
    return {"mean_l2": float(err[:, 3].mean()), "max_l2": float(err[:, 3].max())}


def plot_rot_errors(out_dir, stages: dict[str, tuple], T_gt_full):
    """Rotation error in degrees per stage (ref :490-505)."""
    plt = _plt()
    plt.figure(figsize=(8, 4))
    out = {}
    for name, (T, x) in stages.items():
        gt = T_gt_full[x] if x is not None else T_gt_full
        e = metrics.rotation_error_deg(T, gt)
        plt.plot(x if x is not None else np.arange(len(e)), e, label=name)
        out[name] = float(np.mean(e))
    plt.xlabel("frame")
    plt.ylabel("rotation error [deg]")
    plt.legend()
    plt.title("Rotation error")
    _savefig(plt, out_dir, "rot_error.png")
    return out


def plot_track_stats(out_dir, db):
    plt = _plt()
    lengths = db.track_lengths()
    plt.figure(figsize=(6, 4))
    plt.hist(lengths, bins=np.arange(2, max(lengths.max() + 2, 3)),
             log=True)
    plt.xlabel("track length [frames]")
    plt.ylabel("count (log)")
    plt.title("Track length histogram")
    _savefig(plt, out_dir, "track_lengths.png")

    conn = db.connectivity()
    plt.figure(figsize=(8, 3.2))
    plt.plot(conn)
    plt.xlabel("frame")
    plt.ylabel("tracks shared with next frame")
    plt.title("Connectivity")
    _savefig(plt, out_dir, "connectivity.png")

    plt.figure(figsize=(8, 3.2))
    plt.plot(db.link_valid.sum(axis=1))
    plt.xlabel("frame")
    plt.ylabel("stereo links")
    plt.title("Matches per frame")
    _savefig(plt, out_dir, "matches_per_frame.png")

    plt.figure(figsize=(8, 3.2))
    plt.plot(db.inliers_percent)
    plt.xlabel("frame")
    plt.ylabel("inliers [%]")
    plt.title("RANSAC inlier percentage")
    _savefig(plt, out_dir, "inliers_percent.png")


def plot_rel_consecutive(out_dir, name, T_est_kf, T_gt_kf):
    """Relative error between consecutive keyframes (ref :683-796)."""
    plt = _plt()
    B = T_est_kf.shape[0] - 1
    terr, rerr = [], []
    for i in range(B):
        rel_e = T_est_kf[i + 1] @ np.linalg.inv(T_est_kf[i])
        rel_g = T_gt_kf[i + 1] @ np.linalg.inv(T_gt_kf[i])
        d = rel_e @ np.linalg.inv(rel_g)
        terr.append(np.linalg.norm(d[:3, 3]))
        tr = np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.degrees(np.arccos(tr)))
    fig, ax = _plt().subplots(2, 1, figsize=(8, 5), sharex=True)
    ax[0].plot(terr)
    ax[0].set_ylabel("trans err [m]")
    ax[1].plot(rerr)
    ax[1].set_ylabel("rot err [deg]")
    ax[1].set_xlabel("keyframe interval")
    fig.suptitle(f"Consecutive-keyframe relative error — {name}")
    fig.tight_layout()
    fig.savefig(out_dir / f"rel_consecutive_{name}.png", dpi=110)
    _plt().close(fig)
    return {"mean_trans_m": float(np.mean(terr)),
            "mean_rot_deg": float(np.mean(rerr))}


def plot_rel_subseq(out_dir, name, T_est, T_gt, lengths=(100, 400, 800)):
    """KITTI-style sub-sequence relative errors (ref :801-920)."""
    res = metrics.relative_subsequence_error(T_est, T_gt, lengths)
    if not res:
        return res
    plt = _plt()
    plt.figure(figsize=(6, 4))
    Ls = sorted(res.keys())
    plt.plot(Ls, [res[L]["trans_m_per_m_mean"] * 100 for L in Ls], "o-",
             label="translation [%]")
    plt.plot(Ls, [res[L]["rot_deg_per_m_mean"] * 100 for L in Ls], "s-",
             label="rotation [deg/100m]")
    plt.xlabel("sub-sequence length [frames]")
    plt.legend()
    plt.title(f"Relative sub-sequence error — {name}")
    _savefig(plt, out_dir, f"rel_subseq_{name}.png")
    return res


def plot_uncertainty(out_dir, pg_pre, pg_post=None):
    """Log-det of location/rotation marginal covariance per keyframe
    (ref :1125-1263)."""
    plt = _plt()
    C = pg_pre.covariance_full()
    N = pg_pre.num_nodes
    loc = [np.linalg.slogdet(C[i, 3:, i, 3:] + 1e-12 * np.eye(3))[1]
           for i in range(1, N)]
    rot = [np.linalg.slogdet(C[i, :3, i, :3] + 1e-12 * np.eye(3))[1]
           for i in range(1, N)]
    plt.figure(figsize=(8, 4))
    plt.plot(loc, label="location (pre-LC)")
    plt.plot(rot, label="rotation (pre-LC)")
    if pg_post is not None and pg_post.num_edges > pg_pre.num_edges:
        C2 = pg_post.covariance_full()
        loc2 = [np.linalg.slogdet(C2[i, 3:, i, 3:] + 1e-12 * np.eye(3))[1]
                for i in range(1, N)]
        plt.plot(loc2, "--", label="location (post-LC)")
    plt.xlabel("keyframe")
    plt.ylabel("log-det covariance")
    plt.legend()
    plt.title("Pose uncertainty along the trajectory")
    _savefig(plt, out_dir, "uncertainty.png")


def plot_loops(out_dir, pg, T_gt_kf):
    plt = _plt()
    c = metrics.camera_centers(pg.nodes)
    plt.figure(figsize=(7, 6))
    g = metrics.camera_centers(T_gt_kf)
    plt.plot(g[:, 0], g[:, 2], "k-", lw=1, label="gt")
    plt.plot(c[:, 0], c[:, 2], "b-", lw=1, label="pose graph")
    for i, j, is_loop in zip(pg.e_i, pg.e_j, pg.is_loop):
        if is_loop:
            plt.plot([c[i, 0], c[j, 0]], [c[i, 2], c[j, 2]], "r-", lw=2)
    plt.legend()
    plt.axis("equal")
    plt.title("Loop closures")
    _savefig(plt, out_dir, "loops.png")


def plot_factor_errors(out_dir, bundles):
    """Mean stereo-factor error per window, before vs after optimization
    (reference analysis.py:186-211)."""
    plt = _plt()
    n = np.maximum(bundles.num_obs, 1)
    mean_final = np.sqrt(2.0 * bundles.cost / (3.0 * n))
    mean_init = np.sqrt(2.0 * bundles.cost0 / (3.0 * n))
    plt.figure(figsize=(8, 4))
    plt.plot(mean_init, label="initial")
    plt.plot(mean_final, label="optimized")
    plt.xlabel("keyframe window")
    plt.ylabel("mean factor error [px]")
    plt.legend()
    plt.title("Bundle factor error per window")
    _savefig(plt, out_dir, "factor_errors.png")
    return {"mean_final_px": float(mean_final.mean()),
            "mean_init_px": float(mean_init.mean())}


def plot_disparity_histogram(out_dir, db):
    """Histogram of stereo disparities of all valid links (the ex2-lineage
    y-deviation/disparity sanity plot, VAN_ex/code/ex2.py)."""
    plt = _plt()
    links = db.links[db.link_valid]
    disp = links[:, 0] - links[:, 1]
    plt.figure(figsize=(6, 4))
    plt.hist(disp, bins=60, log=True)
    plt.xlabel("disparity [px]")
    plt.ylabel("count (log)")
    plt.title("Stereo disparity histogram")
    _savefig(plt, out_dir, "disparity_hist.png")


def plot_reproj_vs_track_length(out_dir, db, T_frames, calib,
                                max_tracks: int = 500, seed: int = 0):
    """Median reprojection error as a function of distance from the
    triangulation frame, per track-length bucket (reference
    analysis.py:340-439: 500-track stratified sample).

    Uses the supplied per-frame poses (PnP or BA trajectory): each sampled
    track is triangulated at its max-disparity frame and reprojected into
    every frame it appears on.
    """
    import jax.numpy as jnp

    from ..ops import se3, stereo

    plt = _plt()
    rng = np.random.default_rng(seed)
    lengths = db.track_lengths()
    ids = np.nonzero(lengths >= 3)[0]
    if len(ids) == 0:
        return {}
    sample = rng.choice(ids, size=min(max_tracks, len(ids)), replace=False)

    calib_j = jnp.asarray(calib)
    by_dist: dict[int, list] = {}
    for t in sample:
        frs, slots = db.track_slots(int(t))
        links = db.links[frs, slots]
        disp = links[:, 0] - links[:, 1]
        k = int(np.argmax(disp))
        # triangulate at frame k, lift to world
        pc = np.asarray(stereo.backproject(calib_j, jnp.asarray(links[k])))
        Tk = T_frames[frs[k]]
        pw = np.linalg.inv(Tk) @ np.append(pc, 1.0)
        for i, f in enumerate(frs):
            pred = np.asarray(stereo.project(
                calib_j,
                jnp.asarray((T_frames[f] @ pw)[:3])[None],
            ))[0]
            err = float(np.linalg.norm(pred - links[i]))
            by_dist.setdefault(abs(int(f) - int(frs[k])), []).append(err)

    dists = sorted(by_dist)
    med = [float(np.median(by_dist[d])) for d in dists]
    plt.figure(figsize=(7, 4))
    plt.plot(dists, med, "o-")
    plt.xlabel("frames from triangulation frame")
    plt.ylabel("median reprojection error [px]")
    plt.title("Reprojection error vs track distance")
    _savefig(plt, out_dir, "reproj_vs_track_length.png")
    return {str(d): m for d, m in zip(dists, med)}


def visualize_track(out_dir, db, images_left, track_id: int,
                    crop: int = 10, max_frames: int = 12):
    """Patch strip of one feature track across its frames (reference
    utils.visualize_track :91-120)."""
    plt = _plt()
    frs, slots = db.track_slots(track_id)
    frs = frs[:max_frames]
    slots = slots[:max_frames]
    n = len(frs)
    fig, axes = plt.subplots(1, n, figsize=(1.2 * n, 1.8))
    if n == 1:
        axes = [axes]
    H, W = images_left.shape[1:3]
    for ax, f, s in zip(axes, frs, slots):
        x, y = db.xy[f, s]
        x0 = int(np.clip(x - crop, 0, W - 2 * crop))
        y0 = int(np.clip(y - crop, 0, H - 2 * crop))
        ax.imshow(images_left[f, y0 : y0 + 2 * crop, x0 : x0 + 2 * crop],
                  cmap="gray")
        ax.scatter([x - x0], [y - y0], c="r", s=12)
        ax.set_title(str(int(f)), fontsize=7)
        ax.axis("off")
    fig.suptitle(f"track {track_id}")
    fig.tight_layout()
    fig.savefig(Path(out_dir) / f"track_{track_id}.png", dpi=110)
    plt.close(fig)


def run_analysis(result, T_gt: np.ndarray, out_dir: str | Path) -> dict:
    """Produce the full plot set + summary dict (reference run_analysis,
    analysis.py:1277-1362)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    db = result.db
    kfs = result.pose_graph.keyframes
    T_gt_kf = T_gt[kfs]

    report: dict = {"db_stats": db.stats()}

    plot_track_stats(out_dir, db)
    stages_frames = {
        "frontend (PnP)": result.T_frontend,
        "bundle-adjusted": result.T_bundled_frames,
    }
    stages_kf = {
        "pose graph": result.pose_graph_pre_lc.nodes,
    }
    if result.closures:
        stages_kf["pose graph + LC"] = result.pose_graph.nodes

    plot_trajectories(
        out_dir, T_gt,
        {**stages_frames,
         **{k: v for k, v in stages_kf.items()}},
    )

    report["abs_error"] = {}
    for name, T in stages_frames.items():
        key = name.split(" ")[0]
        report["abs_error"][key] = plot_abs_errors(out_dir, key, T, T_gt)
    for name, T in stages_kf.items():
        key = name.replace(" ", "_").replace("+_", "")
        report["abs_error"][key] = plot_abs_errors(
            out_dir, key, T, T_gt_kf, x=np.asarray(kfs)
        )

    report["rot_error_deg"] = plot_rot_errors(
        out_dir,
        {"frontend": (result.T_frontend, None),
         "pose_graph": (result.pose_graph_pre_lc.nodes, np.asarray(kfs))},
        T_gt,
    )
    report["rel_consecutive"] = plot_rel_consecutive(
        out_dir, "pose_graph", result.pose_graph_pre_lc.nodes, T_gt_kf
    )
    report["rel_subseq"] = {
        "frontend": plot_rel_subseq(out_dir, "frontend", result.T_frontend,
                                    T_gt),
        "bundled": plot_rel_subseq(out_dir, "bundled",
                                   result.T_bundled_frames, T_gt),
    }
    plot_uncertainty(out_dir, result.pose_graph_pre_lc,
                     result.pose_graph if result.closures else None)
    plot_loops(out_dir, result.pose_graph, T_gt_kf)
    plot_disparity_histogram(out_dir, db)
    report["factor_errors"] = plot_factor_errors(out_dir, result.bundles)
    if getattr(result, "calib", None) is not None:
        report["reproj_vs_dist"] = plot_reproj_vs_track_length(
            out_dir, db, result.T_bundled_frames, result.calib,
            max_tracks=200,
        )

    report["ate_rmse"] = {
        "frontend": metrics.ate_rmse(result.T_frontend, T_gt),
        "bundled": metrics.ate_rmse(result.T_bundled_frames, T_gt),
        "pose_graph": metrics.ate_rmse(result.pose_graph_pre_lc.nodes,
                                       T_gt_kf),
    }
    if result.closures:
        report["ate_rmse"]["pose_graph_lc"] = metrics.ate_rmse(
            result.pose_graph.nodes, T_gt_kf
        )
    report["num_closures"] = len(result.closures)

    (out_dir / "analysis.json").write_text(
        json.dumps(report, indent=2, default=float)
    )
    return report
