"""Matmul-precision control for geometry kernels.

On TPU, float32 matmuls/einsums default to reduced-precision MXU passes
(bfloat16 inputs). That is the right trade for descriptor matching and
image convolutions, but catastrophically wrong for the geometry stack:
normal equations, SE(3) chains, Schur complements and covariance inverses
amplify the ~3 decimal digits of bf16 into meter-level trajectory error
(observed: 20x ATE inflation vs CPU on identical inputs).

``@full_precision`` pins jnp.dot/einsum/conv inside the decorated function
to true float32 accumulation. Applied to every geometry solver; the
feature/matching path deliberately stays on the fast bf16 path.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Decorator: run ``fn`` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
