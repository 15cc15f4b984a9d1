"""ThreadSanitizer gate for the native runtime's threaded prefetcher.

The reference is single-threaded (SURVEY.md §5: no race detection to
port), but this framework's C++ runtime adds a prefetch worker + decode
pool, so it gets a sanitizer gate: build runtime/tsan_main.cpp with
-fsanitize=thread, run it against a small PNG set, and fail on any
ThreadSanitizer report.

Usage:  python scripts/tsan_native.py      (exit 0 = clean)
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    try:
        import cv2
    except ImportError:
        print("cv2 unavailable; cannot write PNG fixtures", file=sys.stderr)
        return 0  # not a failure of the runtime itself

    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        F, H, W = 11, 32, 40  # 11 frames: exercises the padded tail chunk
        rng = np.random.default_rng(0)
        for i in range(F):
            cv2.imwrite(str(tdp / f"l{i:03d}.png"),
                        (rng.random((H, W)) * 255).astype(np.uint8))
            cv2.imwrite(str(tdp / f"r{i:03d}.png"),
                        (rng.random((H, W)) * 255).astype(np.uint8))
        exe = tdp / "tsan_check"
        build = subprocess.run(
            ["g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
             str(ROOT / "slam_tpu/runtime/tsan_main.cpp"),
             "-o", str(exe), "-lpng", "-lz", "-lpthread"],
            capture_output=True, text=True,
        )
        if build.returncode != 0:
            print(build.stderr, file=sys.stderr)
            return 1
        run = subprocess.run(
            [str(exe), str(tdp), str(F), str(H), str(W)],
            capture_output=True, text=True,
            env={"TSAN_OPTIONS": "halt_on_error=0 exitcode=66"},
        )
        print(run.stdout)
        reports = run.stderr.count("WARNING: ThreadSanitizer")
        if run.returncode not in (0,) or reports:
            print(run.stderr[-4000:], file=sys.stderr)
            print(f"TSAN: {reports} report(s), exit {run.returncode}",
                  file=sys.stderr)
            return 1
        print("TSAN: clean (3 full streams, mid-stream destroy, "
              "concurrent consumers)")
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
