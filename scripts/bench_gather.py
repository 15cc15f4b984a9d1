"""Micro-benchmark: descriptor cell gather strategies on TPU.

The descriptor sampling step gathers maps[(8,H,W)] at (K,16) keypoint
cell centers -> (8,K,16); at round-3 HEAD it is ~38% of frontend frame
time (0.53 ms/image at F=16, K=2048).

Timing harness note (round 3): on the tunneled axon platform
``block_until_ready`` returns without forcing execution, so naive timing
loops measure dispatch only. Every variant here is timed by chaining N
iterations through a scalar carry inside one jitted step and forcing a
single scalar readback at the end; the 1-iteration run is subtracted to
remove the fixed dispatch+readback cost.

Established facts from the chained harness (previous measurements, F=16
batches of (8, 376, 1241) f32 maps, K=2048, 16 cells/kp):

  base fancy-index gather     0.526 ms/image   (16 indices/kp)
  f16-pair packed (4 ch)      0.454 ms/image
  channel-last (H,W,8)        0.497 ms/image
  int8 maps (same indices)    0.274 ms/image   (quantizes values)
  K-scaling                   linear in K  -> per-index bound
  table/16 downsample         0.295 ms/image   (cache effect exists)

The remaining lever: fewer indices per keypoint, each pulling a
contiguous span — pre-concatenate the 4 x-shifted copies of the maps so
one (y, x) index yields a whole 4-cell x 8-channel row of the
descriptor (4 indices/kp instead of 16).

Usage: python scripts/bench_gather.py [--iters 21] [--K 2048] [--F 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=21)
    ap.add_argument("--K", type=int, default=2048)
    ap.add_argument("--F", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    H, W, C, K, F = 376, 1241, 8, args.K, args.F
    maps = jax.random.uniform(jax.random.PRNGKey(0), (F, C, H, W),
                              jnp.float32)
    py0 = jax.random.randint(jax.random.PRNGKey(1), (F, K), 12, H - 12)
    px0 = jax.random.randint(jax.random.PRNGKey(2), (F, K), 12, W - 12)
    _ = float(maps.sum())
    _ = int(py0.sum())
    _ = int(px0.sum())
    OFF = jnp.array([-6, -2, 2, 6], jnp.int32)

    def bench(name, fn, *fargs, iters=args.iters):
        @jax.jit
        def step(carry, *a):
            o = fn(*a)
            return carry + o.reshape(F, -1)[:, 0].astype(jnp.float32).sum()

        def run(n):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                c = step(c, *fargs)
            float(c)  # single readback forces the whole chain
            return time.perf_counter() - t0

        run(2)  # warm compile
        t1, tn = run(1), run(iters)
        per = (tn - t1) / (iters - 1)
        print(f"{name:26s} {per * 1e3 / F:8.4f} ms/image "
              f"({per * 1e3:.2f} ms/call)", flush=True)
        return per

    # current production path: 16 fancy indices per keypoint
    def base16(m, py0, px0):
        py = py0[:, :, None] + OFF[None, None, :]
        px = px0[:, :, None] + OFF[None, None, :]
        pyy = jnp.broadcast_to(py[:, :, :, None], (F, K, 4, 4)).reshape(
            F, K, 16)
        pxx = jnp.broadcast_to(px[:, :, None, :], (F, K, 4, 4)).reshape(
            F, K, 16)
        return jax.vmap(lambda mm, yy, xx: mm[:, yy, xx])(m, pyy, pxx)

    bench("base16 f32", base16, maps, py0, px0)

    # shifted 32-channel map (built OUTSIDE timing: in production the
    # detection kernel can emit it directly), 4 indices/kp
    def build_shift32(m, dtype):
        m = m.astype(dtype)
        sh = [jnp.roll(m, -int(o), axis=3) for o in (-6, -2, 2, 6)]
        xm = jnp.concatenate(sh, axis=1)          # (F, 32, H, W)
        return jnp.transpose(xm, (0, 2, 3, 1))    # (F, H, W, 32)

    def gather4(xm, py0, px0):
        py = py0[:, :, None] + OFF[None, None, :]         # (F, K, 4)
        pxb = jnp.broadcast_to(px0[:, :, None], (F, K, 4))
        return jax.vmap(lambda mm, yy, xx: mm[yy, xx])(xm, py, pxb)

    for dtype, tag in ((jnp.float32, "f32"), (jnp.float16, "f16")):
        xm = jax.jit(build_shift32, static_argnums=1)(maps, dtype)
        _ = float(xm[0, 0, 0, 0])
        bench(f"shift32 {tag} gather-only", gather4, xm, py0, px0)

    # same, but include the shift32 build in the timed step (upper bound
    # when the build is NOT fused into the detection kernel)
    def shift_and_gather(m, py0, px0):
        return gather4(build_shift32(m, jnp.float32), py0, px0)

    bench("shift32 f32 build+gather", shift_and_gather, maps, py0, px0)

    # flattened span gather: operand (H, W*32), one lax.gather of a
    # 32-wide contiguous slice per (kp, row) — layout-proof variant
    def gather4_flat(xmf, py0, px0):
        py = (py0[:, :, None] + OFF[None, None, :]).reshape(F, K * 4)
        pxb = jnp.broadcast_to(px0[:, :, None], (F, K, 4)).reshape(F, K * 4)
        starts = jnp.stack([py, pxb * 32], axis=-1)  # (F, K*4, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return jax.vmap(
            lambda mm, st: jax.lax.gather(
                mm, st, dn, slice_sizes=(1, 32),
                mode=jax.lax.GatherScatterMode.CLIP)
        )(xmf, starts)

    xm32 = jax.jit(build_shift32, static_argnums=1)(maps, jnp.float32)
    xmf = jax.jit(lambda x: x.reshape(F, H, W * 32) * 1.0)(xm32)
    _ = float(xmf[0, 0, 0])
    bench("shift32 f32 flat-span", gather4_flat, xmf, py0, px0)

    # channel-last flat view (H, W*8): row y is W*8 contiguous floats, so
    # a (13, 128) slice per keypoint covers the whole 4x4 cell grid (13 px
    # square x 8 channels) — ONE gather index per keypoint. Build is a
    # single (8,H,W)->(H,W,8) transpose (15 MB/image).
    def build_clast_flat(m):
        return jnp.transpose(m, (0, 2, 3, 1)).reshape(F, H, W * C)

    sel = jnp.array([0, 4, 8, 12], jnp.int32)

    def patch13(mf, py0, px0):
        starts = jnp.stack([py0 - 6, (px0 - 6) * C], axis=-1)  # (F, K, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        g = jax.vmap(
            lambda mm, st: jax.lax.gather(
                mm, st, dn, slice_sizes=(13, 16 * C),
                mode=jax.lax.GatherScatterMode.CLIP)
        )(mf, starts)                                  # (F, K, 13, 128)
        g = g.reshape(F, K, 13, 16, C)
        return g[:, :, sel][:, :, :, sel]              # (F, K, 4, 4, 8)

    # 4 indices/kp pulling one 128-wide contiguous row span each
    def span16(mf, py0, px0):
        py = (py0[:, :, None] + OFF[None, None, :]).reshape(F, K * 4)
        pxs = jnp.broadcast_to(((px0 - 6) * C)[:, :, None],
                               (F, K, 4)).reshape(F, K * 4)
        starts = jnp.stack([py, pxs], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        g = jax.vmap(
            lambda mm, st: jax.lax.gather(
                mm, st, dn, slice_sizes=(1, 16 * C),
                mode=jax.lax.GatherScatterMode.CLIP)
        )(mf, starts)                                  # (F, K*4, 128)
        g = g.reshape(F, K, 4, 16, C)
        return g[:, :, :, sel]                         # (F, K, 4, 4, 8)

    mflat = jax.jit(build_clast_flat)(maps)
    _ = float(mflat[0, 0, 0])
    bench("clast-flat patch13 1-idx", patch13, mflat, py0, px0)
    bench("clast-flat span16 4-idx", span16, mflat, py0, px0)

    def build_and_patch(m, py0, px0):
        return patch13(build_clast_flat(m), py0, px0)

    bench("patch13 build+gather", build_and_patch, maps, py0, px0)

    # correctness: shifted 4-index gather == base 16-index gather.
    # base16 output (F, 8, K, 16) has cell = iy*4+ix; shift32 output
    # (F, K, 4=iy, 32=ix*8+c) — same elements, (iy, ix, c) order.
    import numpy as np

    ref = np.asarray(base16(maps, py0, px0))            # (F, 8, K, 16)
    ref = ref.transpose(0, 2, 3, 1).reshape(F, K, 4, 4, 8)
    got = np.asarray(gather4(xm32, py0, px0)).reshape(F, K, 4, 4, 8)
    assert np.array_equal(ref, got), "shift32 gather mismatch"
    gotf = np.asarray(gather4_flat(xmf, py0, px0)).reshape(F, K, 4, 4, 8)
    assert np.array_equal(ref, gotf), "flat-span gather mismatch"
    gotp = np.asarray(patch13(mflat, py0, px0))
    assert np.array_equal(ref, gotp), "patch13 gather mismatch"
    gots = np.asarray(span16(mflat, py0, px0))
    assert np.array_equal(ref, gots), "span16 gather mismatch"
    print("parity OK: all variants bit-equal base16")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
