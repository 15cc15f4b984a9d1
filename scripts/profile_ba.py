"""Per-phase on-chip profile of the BA Schur-LM engine at bench shapes.

Cumulative ablation of one LM iteration (vmapped over B windows, matching
bench.py's bench_ba_windows): residual+Jacobian evaluation, one-hot block
build without/with the cross block Wc, and the full Schur solve. Each
stage's scan carries the points through a result-dependent perturbation —
WITHOUT that, XLA hoists the loop-invariant solve out of the scan and the
"x ITERS" timing silently measures one iteration (that failure mode
produced a 27x-wrong profile during round 3; keep the carry dependence).

Usage: python scripts/profile_ba.py [B P L M ITERS]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from slam_tpu.ops import ba, stereo  # noqa: E402
from slam_tpu.ops.precision import full_precision  # noqa: E402

B, P, L, M, ITERS = 64, 24, 512, 4096, 20
if len(sys.argv) > 1:
    B, P, L, M, ITERS = map(int, sys.argv[1:6])

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


def run(tag, stage):
    def inner(poses, pts):
        def one(po, pt, ci, li, me, ww):
            oc = (ci[:, None] == jnp.arange(P, dtype=ci.dtype)).astype(
                jnp.float32)
            ol = (li[:, None] == jnp.arange(L, dtype=li.dtype)).astype(
                jnp.float32)

            def body(pt, _):
                r, Xc = ba._residuals(po, pt, ci, li, me, ww, calib)
                Jp, Jl = ba._jacobians(po, pt, ci, li, ww, calib, Xc)
                if stage == "resjac":
                    acc = jnp.sum(Jp[:, 0]) + jnp.sum(Jl[:, 0]) + jnp.sum(r)
                elif stage == "noWc":
                    g_p = oc.T @ ba._jtr3(Jp, r)
                    g_l = ol.T @ ba._jtr3(Jl, r)
                    Hpp = oc.T @ ba._outer3(Jp, Jp).reshape(-1, 36)
                    Hll = ol.T @ ba._outer3(Jl, Jl).reshape(-1, 9)
                    acc = (jnp.sum(g_p) + jnp.sum(g_l) + jnp.sum(Hpp[0])
                           + jnp.sum(Hll[0]))
                elif stage == "blocks":
                    blk = ba._build_blocks_onehot(Jp, Jl, r, oc, ol, P, L)
                    acc = sum(jnp.sum(b[0]) for b in blk)
                else:
                    dp, dl = ba._schur_solve(Jp, Jl, r, ci, li, P, L, 1e-4,
                                             onehots=(oc, ol))
                    acc = jnp.sum(dp) + jnp.sum(dl)
                # result-dependent carry: prevents loop-invariant hoisting
                return pt + 1e-12 * acc, None

            return jax.lax.scan(body, pt, None, length=ITERS)[0]

        return jax.vmap(one)(poses, pts, cam_idx, lm_idx, meas, w)

    f = jax.jit(full_precision(inner))
    out = f(poses, pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(poses, pts)
    jax.block_until_ready(out)
    print(f"{tag:22s}: {(time.perf_counter() - t0) / 3 * 1e3:8.1f} ms",
          flush=True)


@jax.jit
def full(poses, pts):
    return jax.vmap(
        lambda po, pt, ci, li, me, ww: ba.optimize_bundle(
            po, pt, ci, li, me, ww, calib, iters=ITERS)[2]
    )(poses, pts, cam_idx, lm_idx, meas, w)


print(f"B={B} P={P} L={L} M={M} iters={ITERS} "
      f"backend={jax.default_backend()}", flush=True)
run("resjac", "resjac")
run("+blocks w/o Wc", "noWc")
run("+blocks (incl Wc)", "blocks")
run("+full schur solve", "solve")
out = full(poses, pts)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = full(poses, pts)
jax.block_until_ready(out)
t = (time.perf_counter() - t0) / 3
print(f"full LM ({ITERS} iters) : {t * 1e3:8.1f} ms -> "
      f"{B / t:.1f} windows/s", flush=True)
