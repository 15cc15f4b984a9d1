"""Host->device upload codecs through the compressing tunnel (VERDICT r4 #7).

Round-3 finding (scripts/bench_transfer.py + NOTES_ROUND3): the axon
tunnel transport compresses RPC payloads — incompressible bytes move at
~38-42 MB/s while low-entropy buffers move an order of magnitude faster.
The frontend's reference-scale wall-clock is bounded by uploading ~3.1 GB
of uint8 stereo video, so the lever is not more streams (bandwidth-bound,
measured) but LOWER-ENTROPY bytes for the same frames.

Codec candidate: mod-256 temporal deltas. Video frames change little
frame-to-frame; d[0] = x[0], d[i] = x[i] - x[i-1] (uint8 wraparound) has
a fraction of the entropy. Reconstruction on device is exact:
x = cumsum(d, axis=0) mod 256 — one cheap int32 cumsum, no quality loss.

Measures, on a window of the actual reference-scale rendered sequence
(or --synthetic fallback):
  raw       : device_put of the uint8 chunk as-is
  delta     : device_put of the temporal-delta chunk + on-device cumsum
              reconstruction (timed together; asserts bit-exactness)
plus each payload's zlib-1 compressibility as the entropy proxy.

Usage: python scripts/bench_upload_codec.py [--images runs/scale/images_L.npy]

MEASURED 2026-08-19 (64 frames of the reference-scale rendered sequence,
TPU v5e via axon): NEGATIVE result. zlib-1 ratio raw 2.56x vs delta
1.85x; upload raw 51.9 MB/s vs delta 30.9 MB/s. The renderer's
per-pixel sensor noise is independent frame-to-frame, so differencing
DOUBLES the noise variance while destroying the smooth structure the
transport's compressor exploits — the delta payload has HIGHER entropy
than the frames themselves. Raw uint8 (shipped since round 2) is
already the right codec for this payload; the remaining upload floor is
tunnel bandwidth on the noise bits, which no lossless transform removes.
"""

from __future__ import annotations

import argparse
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def temporal_delta(chunk: np.ndarray) -> np.ndarray:
    d = chunk.copy()
    d[1:] = chunk[1:] - chunk[:-1]  # uint8 wraparound
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=Path,
                    default=Path("runs/scale/images_L.npy"))
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.images.exists():
        imgs = np.load(args.images, mmap_mode="r")[: args.frames]
        imgs = np.ascontiguousarray(imgs)
        src = str(args.images)
    else:
        from slam_tpu.utils import synthetic

        scene = synthetic.make_scene(
            jax.random.PRNGKey(0), num_frames=args.frames,
            num_landmarks=12000, hw=(376, 1241), step_m=1.0)
        L, _ = synthetic.render_sequence(scene)
        imgs = np.clip(np.asarray(L) * 255, 0, 255).astype(np.uint8)
        src = "synthetic (render_sequence)"
    F, H, W = imgs.shape
    mb = imgs.nbytes / 1e6
    print(f"source: {src}  ({F}x{H}x{W} uint8, {mb:.1f} MB)", flush=True)

    @jax.jit
    def reconstruct(d):
        return jnp.cumsum(d.astype(jnp.int32), axis=0).astype(jnp.uint8)

    # entropy proxy
    for name, payload in (("raw", imgs),
                          ("delta", temporal_delta(imgs))):
        z = len(zlib.compress(payload.tobytes(), 1))
        print(f"zlib-1 ratio {name:6s}: {payload.nbytes / z:.2f}x",
              flush=True)

    # upload timing, chunked like the frontend
    def put_raw(c):
        return jax.device_put(c)

    def put_delta(c):
        return reconstruct(jax.device_put(temporal_delta(c)))

    for name, put in (("raw", put_raw), ("delta", put_delta)):
        # correctness first
        got = np.asarray(put(imgs[: args.chunk]))
        assert (got == imgs[: args.chunk]).all(), f"{name} not bit-exact"
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            outs = []
            for s in range(0, F, args.chunk):
                outs.append(put(imgs[s : s + args.chunk]))
            jax.block_until_ready(outs[-1])
            best = min(best, time.perf_counter() - t0)
        print(f"upload {name:6s}: {mb / best:8.1f} MB/s  "
              f"({best:.2f} s best-of-{args.trials})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
