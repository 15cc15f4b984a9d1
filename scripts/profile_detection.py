"""Detection-internals ablation: where does detect+describe time go?

Splits the per-image detection cost (the largest frontend stage,
scripts/profile_frontend.py) into its four parts at benchmark shapes:
fused Harris response, fused orientation-cell maps, gridded top-K
selection, and the descriptor cell gather — plus isolated timings of the
selection sub-steps (NMS-map argmax passes vs top_k vs subpixel) and of
gather layout variants, so layout experiments are measured rather than
guessed (BENCH.md records earlier variant attempts).

Usage: python scripts/profile_detection.py [--frames 16] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, iters, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from slam_tpu.ops import features
    from slam_tpu.utils import synthetic

    F, H, W, K = args.frames, 376, 1241, 2048
    scene = synthetic.make_scene(
        jax.random.PRNGKey(0), num_frames=F, num_landmarks=12000,
        hw=(H, W), step_m=1.0,
    )
    L, _ = synthetic.render_sequence(scene)
    imgs = jnp.asarray(np.asarray(L), jnp.float32)

    on_tpu = jax.default_backend() == "tpu"
    res = {}
    if on_tpu:
        from slam_tpu.ops import pallas_kernels as pk

        t = timeit(jax.jit(pk.harris_response_batch), args.iters, imgs)
        res["harris_ms"] = 1e3 * t / F
        t = timeit(jax.jit(pk.orientation_cell_maps_batch), args.iters, imgs)
        res["orient_maps_ms"] = 1e3 * t / F
        resp, nms = pk.harris_response_batch(imgs)
        maps = pk.orientation_cell_maps_batch(imgs)
    else:
        resp = jax.vmap(features.harris_response)(imgs)
        nms = None
        maps = jax.vmap(features.orientation_cell_maps)(imgs)

    sel = jax.jit(jax.vmap(
        lambda r, rn: features.select_keypoints(r, K, resp_nms=rn)))
    sel_args = (resp, nms if nms is not None
                else jax.vmap(features._nms)(resp))
    t = timeit(sel, args.iters, *sel_args)
    res["select_ms"] = 1e3 * t / F
    det = sel(*sel_args)

    desc_fn = jax.jit(jax.vmap(
        lambda im, xy, v, mp: features.describe(im, xy, v, maps=mp)))
    t = timeit(desc_fn, args.iters, imgs, det["xy"], det["valid"], maps)
    res["describe_ms"] = 1e3 * t / F

    # gather-only: the 16-cell descriptor sample at fixed indices
    px = jnp.clip(det["xy"][..., 0:1].astype(jnp.int32) +
                  jnp.arange(16)[None, None, :] * 2 - 15, 0, W - 1)
    py = jnp.clip(det["xy"][..., 1:2].astype(jnp.int32) +
                  jnp.arange(16)[None, None, :] * 2 - 15, 0, H - 1)

    gather_cf = jax.jit(jax.vmap(lambda mp, y, x: mp[:, y, x]))
    t = timeit(gather_cf, args.iters, maps, py, px)
    res["gather_chfirst_ms"] = 1e3 * t / F

    maps_cl = jnp.ascontiguousarray(jnp.transpose(maps, (0, 2, 3, 1)))
    gather_cl = jax.jit(jax.vmap(lambda mp, y, x: mp[y, x, :]))
    t = timeit(gather_cl, args.iters, maps_cl, py, px)
    res["gather_chlast_ms"] = 1e3 * t / F

    # flat-index row gather: (H*W, 8) table, one fused index
    maps_flat = maps_cl.reshape(F, H * W, 8)
    flat_idx = py * W + px
    gather_flat = jax.jit(jax.vmap(lambda mp, i: jnp.take(mp, i, axis=0)))
    t = timeit(gather_flat, args.iters, maps_flat, flat_idx)
    res["gather_flatrows_ms"] = 1e3 * t / F

    res["sum_ms"] = sum(v for k, v in
                        (("h", res.get("harris_ms", 0)),
                         ("o", res.get("orient_maps_ms", 0)),
                         ("s", res["select_ms"]),
                         ("d", res["describe_ms"])))
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
