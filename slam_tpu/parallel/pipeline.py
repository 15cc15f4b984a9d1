"""Pipelined execution: overlap host IO, host<->device transfer, and device
compute.

The reference's stages run strictly sequentially (SURVEY.md §2.4 PP row:
stage caching in project.py:29-91 is sequential). Here the frontend is a
3-stage software pipeline:

  [native loader threads]  decode stereo chunk c+1     (runtime C++)
  [host->device]           transfer chunk c+1          (async device_put)
  [device]                 detect/match/RANSAC chunk c (jit, dispatched
                            asynchronously — JAX returns futures)

so PNG decode and transfer hide behind TPU compute. Multi-sequence runs
(BASELINE.json config #5) reuse the same compiled kernels across
sequences — compilation happens once for the whole batch.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..models import frontend as frontend_mod


def run_frontend_pipelined(
    left_paths: list,
    right_paths: list,
    hw: tuple[int, int],
    calib,
    cfg: SlamConfig = SlamConfig(),
    n_io_threads: int = 3,
):
    """Frontend over on-disk PNG sequences with the native prefetcher.

    Falls back to eager loading (utils.kitti.read_batch style) when the
    native runtime is unavailable.
    """
    from .. import runtime

    F = len(left_paths)
    chunk = cfg.runtime.chunk_frames
    calib_j = jnp.asarray(calib, jnp.float32)
    # position-based keys, identical to models/frontend.run_frontend
    base_key = jax.random.PRNGKey(cfg.seed)

    if runtime._load():
        loader = runtime.StereoPrefetcher(
            left_paths, right_paths, hw[0], hw[1], chunk, n_io_threads
        )
        blocks = iter(loader)
    else:  # pragma: no cover - exercised only without a toolchain
        def _eager():
            for s in range(0, F, chunk):
                n = min(chunk, F - s)
                L = np.zeros((chunk, hw[0], hw[1]), np.float32)
                R = np.zeros((chunk, hw[0], hw[1]), np.float32)
                from ..utils.kitti import _imread_gray

                for i in range(n):
                    L[i] = _imread_gray(left_paths[s + i]) / 255.0
                    R[i] = _imread_gray(right_paths[s + i]) / 255.0
                yield L[:n], R[:n]

        blocks = _eager()

    outs = []
    T_w2c_all = []
    T_carry = np.eye(4, dtype=np.float32)
    carry = None
    pending = None  # (out, n) whose host readback is deferred one step

    def pad(x, n):
        if n == chunk:
            return x
        return np.concatenate(
            [x, np.zeros((chunk - n,) + x.shape[1:], x.dtype)]
        )

    for ci, (L, R) in enumerate(blocks):
        n = L.shape[0]
        Lj = jax.device_put(pad(L, n))
        Rj = jax.device_put(pad(R, n))
        sub = jax.random.fold_in(base_key, ci)
        out, carry = frontend_mod.process_chunk(Lj, Rj, carry, calib_j, sub,
                                                cfg)
        # defer materialization by one chunk: the loader decodes the next
        # block while the device crunches this one
        if pending is not None:
            outs.append(_materialize(pending[0], pending[1]))
        pending = (out, n)
    if pending is not None:
        outs.append(_materialize(pending[0], pending[1]))

    for o in outs:
        T = o["T_chain"] @ T_carry[None]
        T_carry = T[-1]
        T_w2c_all.append(T)
    return frontend_mod._assemble_result(outs, T_w2c_all)


def _materialize(out, n):
    # "desc" stays a device array (DescriptorBank chunk — see
    # models/frontend.py); everything else crosses to the host
    out = dict(out)
    out["desc"] = out["desc"][:n]
    return {
        k: (v if k == "desc" else np.asarray(v[:n])) for k, v in out.items()
    }


def run_multi_sequence(
    sequences: dict,
    cfg: SlamConfig = SlamConfig(),
    run_loop_closure: bool = True,
    cache_root: str | Path | None = None,
    verbose: bool = False,
) -> dict:
    """Batched multi-sequence run (BASELINE.json config #5: KITTI
    00/02/05/08). ``sequences`` maps name -> (left (F,H,W), right, calib,
    T_gt or None). All sequences share one set of compiled kernels, so
    compilation amortizes across the batch — unlike the reference, which
    pays its full startup per sequence. KITTI resolutions differ across
    sequences (376x1241 vs 370x1226 ...); images are zero-padded
    bottom/right to one shared bucket (utils.kitti.bucket_for) so every
    sequence hits the same compiled frontend.

    Returns name -> evaluation report (and caches artifacts per sequence).
    """
    from .. import pipeline as pipeline_mod
    from ..utils import kitti as kitti_mod

    bucket = kitti_mod.bucket_for(
        [v[0].shape[1:] for v in sequences.values()]
    )
    reports = {}
    for name, (L, R, calib, T_gt) in sequences.items():
        L = kitti_mod.pad_to_bucket(L, bucket)
        R = kitti_mod.pad_to_bucket(R, bucket)
        cache = Path(cache_root) / name if cache_root else None
        res = pipeline_mod.run_pipeline(
            L, R, calib, cfg, cache_dir=cache,
            run_loop_closure=run_loop_closure, verbose=verbose,
        )
        if T_gt is not None:
            reports[name] = pipeline_mod.evaluate(res, np.asarray(T_gt))
        else:
            reports[name] = {"timings_s": res.timings,
                             "db_stats": res.db.stats(),
                             "num_closures": len(res.closures)}
    return reports
