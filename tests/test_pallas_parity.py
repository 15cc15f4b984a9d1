

"""Pallas kernel parity vs dense references (interpret mode on CPU)."""

import jax.numpy as jnp


def test_cholesky_solve_lanes_matches_dense():
    """Lanes-batched Cholesky (BA Schur solve kernel) vs numpy, interpret
    mode; includes gauge-style identity rows and a non-multiple-of-128
    batch (padding lanes must be inert)."""
    import numpy as np
    from slam_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(3)
    B, N = 12, 48
    A = rng.standard_normal((B, N, N)).astype(np.float32)
    S = A @ np.transpose(A, (0, 2, 1)) + 3.0 * np.eye(N, dtype=np.float32)
    # gauge block: identity rows/cols like the frozen pose 0
    S[:, :6, :] = 0.0
    S[:, :, :6] = 0.0
    S[:, range(6), range(6)] = 1.0
    g = rng.standard_normal((B, N)).astype(np.float32)
    g[:, :6] = 0.0
    dx = np.asarray(pk.cholesky_solve_lanes(
        jnp.asarray(S), jnp.asarray(g), interpret=True))
    ref = np.stack([np.linalg.solve(S[b], g[b]) for b in range(B)])
    err = np.abs(dx - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err
