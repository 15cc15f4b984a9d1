"""Micro-benchmark: host->device transfer strategies through the tunnel.

At reference scale the frontend is image-upload-bound: 3360 frames x
0.93 MB/frame uint8 stereo ~ 3.1 GB through a ~13 MB/s tunnel ~ 230 s,
while the compute itself is ~9 s. If the tunnel link is a single
latency-bound TCP stream, N concurrent device_put calls from threads may
multiply effective bandwidth; if it is genuinely bandwidth-bound,
they won't. This script settles it empirically.

Measured 2026-08-18 (TPU v5 lite via axon tunnel, 32 MB trials, best of
3): 1 stream 38.3 MB/s, 2 -> 39.7, 4 -> 41.6, 8 -> 40.0. Conclusion: the
link is bandwidth-bound — a single device_put already saturates it, and
threaded uploads buy nothing. The day-to-day spread observed across
scale runs (~10-40 MB/s) is tunnel weather, not a client-side artifact.
The remaining lever for the upload-bound scale frontend is overlapping
upload with compute (the chunked host loop already does this), which
bounds wall-clock at max(upload, compute) = upload.

Usage: python scripts/bench_transfer.py [--mb 32] [--streams 1 2 4 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32,
                    help="total MB uploaded per trial")
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    total = args.mb * (1 << 20)

    # readback forces the data to really be on device (block_until_ready
    # is unreliable on this platform): sum one element per chunk
    @jax.jit
    def probe(*chunks):
        return sum(c.reshape(-1)[0].astype(jnp.int32) for c in chunks)

    for n in args.streams:
        per = total // n
        blocks = [
            np.random.default_rng(i).integers(0, 255, per, dtype=np.uint8)
            for i in range(n)
        ]
        rates = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            if n == 1:
                devs = [jax.device_put(blocks[0], dev)]
            else:
                with ThreadPoolExecutor(max_workers=n) as ex:
                    devs = list(ex.map(
                        lambda b: jax.device_put(b, dev), blocks))
            int(probe(*devs))
            dt = time.perf_counter() - t0
            rates.append(total / dt / (1 << 20))
            del devs
        print(f"streams={n}: {max(rates):7.2f} MB/s best "
              f"({', '.join(f'{r:.1f}' for r in rates)})", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
