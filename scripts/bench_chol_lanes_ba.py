"""In-context A/B of the lanes Cholesky: the FULL BA engine at B=128.

The isolated-solve A/B (bench_chol_lanes.py) measures the batched SPD
solve alone; this measures `vmap(optimize_bundle)` end to end, where the
solve competes for VMEM/scheduling with residuals, Jacobians, and the
one-hot Hessian contractions — the regime the roofline's "40 sequential
LM iterations" floor actually lives in.

Usage: SLAM_TPU_CHOL_LANES={0|1} python scripts/bench_chol_lanes_ba.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slam_tpu.ops import ba, stereo  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P, L, M, ITERS = 24, 512, 4096, 20

rng = np.random.default_rng(0)
calib = jnp.asarray([718.856, 718.856, 607.1928, 185.2157, 0.5371657])
poses = jnp.tile(jnp.eye(4)[None], (B, P, 1, 1))
pts = jnp.asarray(rng.uniform([-20, -5, 4], [20, 5, 60], (B, L, 3)),
                  jnp.float32)
cam_idx = jnp.asarray(rng.integers(0, P, (B, M)), jnp.int32)
lm_idx = jnp.asarray(rng.integers(0, L, (B, M)), jnp.int32)
w = jnp.ones((B, M), jnp.float32)
meas = jax.vmap(lambda p, c, l: stereo.project(calib, p[l]))(
    pts, cam_idx, lm_idx)
meas = meas + jnp.asarray(rng.normal(0, 0.3, meas.shape), jnp.float32)
pts0 = pts + jnp.asarray(rng.normal(0, 0.5, pts.shape), jnp.float32)

f = jax.jit(jax.vmap(
    lambda po, pt, ci, li, me, ww: ba.optimize_bundle(
        po, pt, ci, li, me, ww, calib, iters=ITERS)))
out = f(poses, pts0, cam_idx, lm_idx, meas, w)
jax.block_until_ready(out)
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    out = f(poses, pts0, cam_idx, lm_idx, meas, w)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / reps
cost = np.median(np.asarray(out[2]))
mode = os.environ.get("SLAM_TPU_CHOL_LANES", "1")
print(f"chol_lanes={mode}: {dt * 1e3:.1f} ms / {ITERS}-iter B={B} "
      f"optimize_bundle ({B * ITERS / dt / 20:.1f} eq-windows/s @20it); "
      f"cost median {cost:.4f}", flush=True)
