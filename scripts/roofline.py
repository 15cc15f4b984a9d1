"""Per-stage roofline on the real chip (VERDICT r3 weak #1 / next #2).

For each pipeline stage at bench shapes, reports:
  * achieved FLOP/s — XLA cost_analysis "flops" (plus the analytic Pallas
    supplements bench.py uses, which XLA counts as 0) / steady-state
    wall-clock,
  * achieved HBM GB/s — cost_analysis "bytes accessed" / wall-clock
    (an upper bound on true HBM traffic: XLA counts operand+result bytes
    per HLO, so fused/in-register reuse is over-counted),
  * percent of peak for each, and which bound binds.

Peaks (TPU v5e): 197 TF/s bf16 MXU, ~25 TF/s f32 6-pass emulation,
~820 GB/s HBM. The geometry stages run under @full_precision (6-pass
f32), so their compute roofline is the f32 line, not bf16.

Usage: python scripts/roofline.py  (owns the chip; ~3-5 min warm)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 8  # 6-pass emulation + pass overheads, measured ~1/8
PEAK_HBM = 820e9


def measure(tag, fn, args, extra_flops=0.0, peak_flops=PEAK_F32,
            per_unit=None, trials=10):
    import jax

    jfn = jax.jit(fn)
    compiled = jfn.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) + extra_flops
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    out = jfn(*args)
    jax.block_until_ready(out)
    # amortized timing: dispatch `trials` executions back-to-back and block
    # once — device executions queue in order, so the ~20 ms tunnel RPC
    # latency amortizes instead of polluting every sample (single-dispatch
    # timing read 24 ms for a 1 GF matmul)
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(trials)]
    jax.block_until_ready(outs[-1])
    best = (time.perf_counter() - t0) / trials
    gfs = flops / best / 1e9
    gbs = bytes_acc / best / 1e9
    pct_c = flops / best / peak_flops * 100
    pct_m = bytes_acc / best / PEAK_HBM * 100
    bound = "compute" if pct_c > pct_m else "memory/latency"
    unit = f"  [{per_unit[0] / best:8.1f} {per_unit[1]}]" if per_unit else ""
    print(f"{tag:28s}: {best * 1e3:8.2f} ms  {gfs:9.1f} GF/s ({pct_c:5.2f}%"
          f" f32-peak)  {gbs:7.1f} GB/s ({pct_m:5.2f}% HBM)  -> {bound}"
          f"{unit}", flush=True)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from slam_tpu.config import SlamConfig, enable_compile_cache
    from slam_tpu.models import frontend
    from slam_tpu.ops import ba, features, matching, pose_graph as pg_ops
    from slam_tpu.ops import ransac as ransac_ops
    from slam_tpu.ops import se3, stereo
    from slam_tpu.utils import synthetic
    from slam_tpu.utils.synthetic import KITTI_CALIB

    cfg = SlamConfig()
    enable_compile_cache(cfg.runtime)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    H, W, CHUNK = 376, 1241, 8
    scene = synthetic.make_scene(jax.random.PRNGKey(0), num_frames=CHUNK * 2,
                                 num_landmarks=12000, hw=(H, W), step_m=1.0)
    Ls, Rs = synthetic.render_sequence(scene)
    to8 = lambda x: np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)
    imgs = jnp.asarray(to8(Ls))
    imgs_f = imgs.astype(jnp.float32) * (1.0 / 255.0)  # detect kernels
    calib = jnp.asarray(KITTI_CALIB)
    key = jax.random.PRNGKey(0)
    K = cfg.features.max_kp

    # ---- detect+describe (fused Pallas detection kernels) ----------------
    # XLA counts Pallas custom calls as 0 FLOPs; the analytic supplement is
    # bench.py's ~260 FLOP/px detection estimate.
    det_flops = CHUNK * H * W * 260.0
    measure("detect+describe (chunk=8)",
            lambda im: features.detect_and_describe_batch(
                im, cfg.features.max_kp),
            (imgs_f[:CHUNK],), extra_flops=det_flops, peak_flops=PEAK_BF16,
            per_unit=(CHUNK, "img/s"))

    # ---- descriptor matching (Pallas mutual-NN) ---------------------------
    out = features.detect_and_describe_batch(imgs_f[:2], cfg.features.max_kp)
    desc = out["desc"]
    valid = out["valid"]
    match_flops = 2 * K * K * 128  # CostEstimate matmul term
    measure("match mutual-NN (1 pair)",
            lambda a, b, va, vb: matching.mutual_match(a, b, va, vb),
            (desc[0], desc[1], valid[0], valid[1]),
            extra_flops=match_flops, peak_flops=PEAK_BF16,
            per_unit=(1, "pair/s"))

    # ---- RANSAC-EPnP (512 hypotheses, K correspondences) ------------------
    rng = np.random.default_rng(0)
    pw = jnp.asarray(rng.uniform([-20, -5, 4], [20, 5, 60], (K, 3)),
                     jnp.float32)
    T_true = se3.se3_exp(jnp.asarray([0.01, 0.02, 0.0, 0.05, 0.0, -0.8]))
    Xc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    meas = stereo.project(calib, Xc)
    vmask = jnp.asarray(rng.random(K) < 0.8)
    measure("RANSAC-EPnP (512 hyp)",
            lambda k, p, m, v: ransac_ops.ransac_pnp(
                k, p, m, v, calib,
                num_hypotheses=cfg.ransac.num_hypotheses),
            (key, pw, meas, vmask), per_unit=(1, "frame/s"))

    # ---- full frontend chunk ----------------------------------------------
    _, carry = frontend.process_chunk(imgs[:CHUNK], imgs[:CHUNK], None,
                                      calib, key, cfg)
    fe_flops = det_flops * 2 + CHUNK * 2 * match_flops
    measure("frontend chunk (8 frames)",
            lambda a, b, c: frontend.process_chunk(a, b, c, calib, key,
                                                   cfg)[0]["T_rel"],
            (imgs[:CHUNK], imgs[CHUNK:], carry), extra_flops=fe_flops,
            peak_flops=PEAK_BF16, per_unit=(CHUNK, "frame/s"))

    # ---- batched BA (production shapes, default engine) -------------------
    import bench as bench_mod

    B, P, L, M = bench_mod.BA_WINDOWS, 24, 512, 4096
    t = jnp.arange(P, dtype=jnp.float32)
    xi = jnp.stack([jnp.zeros_like(t), 0.01 * t, jnp.zeros_like(t),
                    0.05 * t, jnp.zeros_like(t), -0.8 * t], -1)
    poses_gt = jax.vmap(se3.se3_exp)(xi)

    def one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        u = jax.random.uniform(k1, (L, 3))
        pts = jnp.stack([(u[:, 0] - .5) * 24, (u[:, 1] - .5) * 6,
                         8 + u[:, 2] * 40], -1)
        ci = jax.random.randint(k2, (M,), 0, P)
        li = jnp.tile(jnp.arange(L), M // L)[:M]
        T = poses_gt[ci]
        Xc = jnp.einsum("mij,mj->mi", T[:, :3, :3], pts[li]) + T[:, :3, 3]
        ms = stereo.project(calib, Xc) + 0.3 * jax.random.normal(k3, (M, 3))
        ww = (Xc[:, 2] > 0.5).astype(jnp.float32)
        dp = 0.01 * jax.random.normal(k4, (P, 6)).at[0].set(0.)
        return (jax.vmap(se3.retract)(poses_gt, dp),
                pts + 0.15 * jax.random.normal(k5, (L, 3)), ci, li, ms, ww)

    batch = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(3), B))
    measure(f"BA pruned 2x20it (B={B})",
            lambda *a: jax.vmap(
                lambda p0, x0, ci, li, ms, ww: ba.optimize_bundle_pruned(
                    p0, x0, ci, li, ms, ww, calib, iters=20))(*a),
            batch, per_unit=(B, "window/s"))

    # ---- loop-closure gate (dense path, reference-scale shapes) -----------
    N = 704  # 653 keyframes padded to the node bucket
    tt = jnp.arange(N, dtype=jnp.float32)
    nodes = jax.vmap(se3.se3_exp)(jnp.stack(
        [jnp.zeros_like(tt)] * 5 + [-0.5 * tt], axis=-1))
    e_i = jnp.arange(N - 1, dtype=jnp.int32)
    e_j = e_i + 1
    Z = jax.vmap(lambda a, b: se3.inverse(a) @ b)(nodes[e_i], nodes[e_j])
    si = jnp.tile((jnp.eye(6) * 50.0)[None], (N - 1, 1, 1))
    ev = jnp.ones(N - 1, bool)
    pi = jnp.arange(0, 8192, dtype=jnp.int32) % (N - 40)
    pj = pi + 37
    measure("LC gate (704 kf, 8192 pairs)",
            lambda *a: pg_ops.gate_matrix(*a),
            (nodes, e_i, e_j, Z, si, ev, pi, pj,
             jnp.ones(N, bool)),
            per_unit=(8192, "pair/s"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
