"""On-chip Mosaic lowering gate: compile every Pallas kernel and the
production frontend entry point on the REAL TPU backend (interpret=False).

Round 2 shipped a kernel (`jnp.arctan2` in the orientation maps) that
passed every interpret-mode parity test but has no Mosaic TPU lowering —
the whole pipeline crashed on the chip while the suite stayed green
(VERDICT.md round 2, weak #1/#2). Interpret mode runs in XLA and
structurally cannot catch lowering gaps; this script can, and it is
compile-only (``jit(...).lower(...).compile()``) so it never touches the
flaky device->host readback path and finishes in ~1 min warm.

Policy: run this (or ``pytest -m tpu``, which shells out to it) before
any commit that touches slam_tpu/ops/pallas_kernels.py or kernel routing.

Exit codes: 0 ok, 2 no TPU backend available, 1 lowering/compile failure.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print(f"SKIP: default backend is {jax.default_backend()!r}, not tpu")
        return 2

    import jax.numpy as jnp

    from slam_tpu.config import SlamConfig, enable_compile_cache
    from slam_tpu.models import frontend
    from slam_tpu.ops import pallas_kernels as pk

    # a cache hit is still lowering evidence (identical program compiled
    # on this chip before; an edited kernel gets a new key and recompiles)
    enable_compile_cache(SlamConfig().runtime)

    checks: list[tuple[str, object, tuple]] = []

    # --- raw Pallas kernels at tiny (tile-aligned) shapes ------------------
    ka = pk.TILE_A
    kb = pk.TILE_B
    d = 128
    desc_a = jnp.zeros((ka, d), jnp.float32)
    desc_b = jnp.zeros((kb, d), jnp.float32)
    va = jnp.ones((ka,), bool)
    vb = jnp.ones((kb,), bool)
    xy = jnp.zeros((ka, 2), jnp.float32)
    checks.append((
        "mutual_nearest",
        lambda a, b, u, v: pk.mutual_nearest(a, b, u, v),
        (desc_a, desc_b, va, vb),
    ))
    checks.append((
        "mutual_nearest[window]",
        lambda a, b, u, v, p, q: pk.mutual_nearest(
            a, b, u, v, xy_a=p, xy_b=q, window=(2.0, 100.0, 2.0)),
        (desc_a, desc_b, va, vb, xy, xy),
    ))
    imgs = jnp.zeros((2, 128, 256), jnp.float32)
    checks.append(("harris_response_batch",
                   lambda im: pk.harris_response_batch(im), (imgs,)))
    checks.append(("orientation_cell_maps_batch",
                   lambda im: pk.orientation_cell_maps_batch(im), (imgs,)))
    checks.append(("orientation_cell_maps_batch[shifted]",
                   lambda im: pk.orientation_cell_maps_batch(
                       im, shifted=True), (imgs,)))
    checks.append(("detect_maps_batch",
                   lambda im: pk.detect_maps_batch(im), (imgs,)))
    # shifted variant at full KITTI width: the 32-channel bf16 maps block
    # is the VMEM-pressure case, invisible at toy widths
    kitti_imgs = jnp.zeros((2, 376, 1241), jnp.float32)
    checks.append(("detect_maps_batch[shifted,kitti]",
                   lambda im: pk.detect_maps_batch(im, shifted=True),
                   (kitti_imgs,)))
    kvals = jnp.full((2,), 0.01, jnp.float32)
    checks.append(("akaze_octave_batch",
                   lambda im, kv: pk.akaze_octave_batch(im, kv),
                   (imgs, kvals)))
    # lanes-batched Cholesky: opt-in after losing its A/B (BENCH.md round
    # 5), but the lowering is still gated so SLAM_TPU_CHOL_LANES=1 can't
    # rot. Small N keeps the (N, N, LANE_B) block far from the VMEM edge.
    spd = jnp.broadcast_to(3.0 * jnp.eye(48, dtype=jnp.float32),
                           (64, 48, 48))
    rhs = jnp.ones((64, 48), jnp.float32)
    checks.append(("cholesky_solve_lanes",
                   lambda s, g: pk.cholesky_solve_lanes(s, g), (spd, rhs)))

    # --- fused-kernel routing of the AKAZE detector ------------------------
    from slam_tpu.ops import akaze

    checks.append((
        "akaze.detect_and_describe_akaze_batch",
        lambda im: akaze.detect_and_describe_akaze_batch(
            im, max_kp=512, use_pallas=True),
        (imgs,),
    ))

    # --- the production frontend entry (covers kernel ROUTING too) ---------
    cfg = SlamConfig()
    calib = jnp.array([718.856, 718.856, 607.1928, 185.2157, 0.5372],
                      jnp.float32)
    chunk = jnp.zeros((2, 376, 1241), jnp.uint8)
    key = jax.random.PRNGKey(0)
    checks.append((
        "frontend.process_chunk",
        lambda l, r, c, k: frontend.process_chunk(l, r, None, c, k, cfg),
        (chunk, chunk, calib, key),
    ))

    failed = []
    for name, fn, args in checks:
        t0 = time.perf_counter()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"OK   {name}  ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report every failure
            failed.append(name)
            msg = str(e).splitlines()
            head = msg[-1] if msg else repr(e)
            print(f"FAIL {name}: {type(e).__name__}: {head}")
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all kernels lower + compile on", jax.devices()[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
