"""A/B the lanes-batched Pallas Cholesky against XLA's vmapped cho_solve.

VERDICT r4 next #7: the BA roofline names ~40 sequential LM iterations of
(B,144,144) SPD solves as the latency floor; this measures the one
below-XLA attack — the window batch moved into the lane axis
(ops/pallas_kernels.cholesky_solve_lanes) — in exactly the BA engine's
shape: a scan of ITERS damped solves over a (B, 6P, 6P) batch.

Run on the real chip. SLAM_TPU_CHOL_LANES gates the routing inside
ba._spd_solve's vmap rule, so both legs go through the production call.

Usage: python scripts/bench_chol_lanes.py [B P ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, P, ITERS = 128, 24, 20
if len(sys.argv) > 1:
    B, P, ITERS = map(int, sys.argv[1:4])
N = 6 * P


def run(tag):
    import jax
    import jax.numpy as jnp

    from slam_tpu.ops import ba

    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, N, N)).astype(np.float32)
    S = A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N, dtype=np.float32)
    S[:, :6, :] = 0.0
    S[:, :, :6] = 0.0
    S[:, range(6), range(6)] = 1.0
    g = rng.standard_normal((B, N)).astype(np.float32)
    g[:, :6] = 0.0

    def scan_solves(S, g):
        def body(c, lam):
            # damping varies per iteration like LM's lambda schedule so
            # XLA can't hoist the factorization out of the scan
            Sd = S + lam * jnp.eye(N)[None]
            x = jax.vmap(ba._spd_solve)(Sd, g + 1e-6 * c)
            return x, None

        lams = jnp.linspace(1e-4, 1e-2, ITERS)
        return jax.lax.scan(body, jnp.zeros_like(g), lams)[0]

    f = jax.jit(scan_solves)
    out = f(S, g)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(S, g)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    # numpy replay of the same scan (f64) for a correctness check
    ref = np.zeros_like(g)
    for lam in np.linspace(1e-4, 1e-2, ITERS):
        Sd = (S + lam * np.eye(N, dtype=np.float32)[None]).astype(np.float64)
        ref = np.linalg.solve(Sd, (g + 1e-6 * ref)[..., None])[..., 0]
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"{tag}: {dt * 1e3:.1f} ms / {ITERS}-iter B={B} N={N} solve; "
          f"rel err vs f64-free numpy {err:.2e}", flush=True)


mode = os.environ.get("SLAM_TPU_CHOL_LANES", "1")
run(f"chol_lanes={mode}")
