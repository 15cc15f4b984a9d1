"""Calibrated rectified-stereo camera model in pure JAX.

Replaces ``gtsam.Cal3_S2Stereo`` + ``gtsam.StereoCamera`` (reference:
final_project/backend/GTSam/bundle.py:19,104,146-148) and the raw projection
matrices ``P = K @ M1``, ``Q = K @ M2`` (reference utils.py:137-138).

A stereo measurement is the triplet ``(uL, uR, v)``: x pixel in the left
image, x pixel in the right image, and the shared (rectified) y coordinate —
exactly the reference's ``Link`` layout (tracking_database.py:12-29).

Calibration is a flat float vector ``calib = [fx, fy, cx, cy, baseline]``
(skew is always 0 for KITTI); keeping it a plain array makes every function
trivially vmappable and shardable.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def calib_from_K(K: jnp.ndarray, baseline: float) -> jnp.ndarray:
    """Pack a 3x3 intrinsics matrix + baseline into the flat calib vector."""
    return jnp.array(
        [K[0, 0], K[1, 1], K[0, 2], K[1, 2], baseline], dtype=jnp.float32
    )


def K_from_calib(calib: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy, _ = calib
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=calib.dtype)


def project(calib: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) -> stereo measurements (..., 3).

    Returns ``(uL, uR, v)``. Mirrors ``StereoCamera.project`` semantics
    (reference bundle.py:104): the right camera is offset by ``baseline``
    along +x of the left camera.
    """
    fx, fy, cx, cy, b = (calib[..., i] for i in range(5))
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uL = fx * x * inv_z + cx
    uR = fx * (x - b) * inv_z + cx
    v = fy * y * inv_z + cy
    return jnp.stack([uL, uR, v], axis=-1)


def backproject(calib: jnp.ndarray, meas: jnp.ndarray) -> jnp.ndarray:
    """Stereo measurement (..., 3) = (uL, uR, v) -> camera-frame point (..., 3).

    Mirrors ``StereoCamera.backproject`` (reference bundle.py:146-148):
    depth from disparity ``z = fx * b / (uL - uR)``.
    """
    fx, fy, cx, cy, b = (calib[..., i] for i in range(5))
    uL, uR, v = meas[..., 0], meas[..., 1], meas[..., 2]
    disp = uL - uR
    disp = jnp.where(jnp.abs(disp) < 1e-6, 1e-6, disp)
    z = fx * b / disp
    x = (uL - cx) * z / fx
    y = (v - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def backproject_np(calib, meas):
    """Host-NumPy :func:`backproject` (same formula, bit-equivalent in f32).

    For host-side callers with small or dynamic-shape inputs (bundle
    landmark init, loop-closure mini-bundle setup): dispatching tiny
    jnp ops through a remote device costs a round-trip per primitive,
    and dynamic shapes would recompile per distinct size.
    """
    import numpy as np

    meas = np.asarray(meas, np.float32)
    fx, fy, cx, cy, b = (float(v) for v in np.asarray(calib).ravel()[:5])
    uL, uR, v = meas[..., 0], meas[..., 1], meas[..., 2]
    disp = uL - uR
    disp = np.where(np.abs(disp) < 1e-6, 1e-6, disp)
    z = fx * b / disp
    x = (uL - cx) * z / fx
    y = (v - cy) * z / fy
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def project_world(
    calib: jnp.ndarray, T_w2c: jnp.ndarray, pts_world: jnp.ndarray
) -> jnp.ndarray:
    """Project world points through extrinsics T_w2c (world->camera)."""
    return project(calib, se3.transform_points(T_w2c, pts_world))


def projection_matrices(
    K: jnp.ndarray, T_w2c_left: jnp.ndarray, baseline: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x4 left/right projection matrices (reference P, Q; utils.py:137-138)."""
    M1 = T_w2c_left[:3, :]
    # Right camera sits +baseline along the left camera's x axis, so the
    # world->right extrinsics shift the translation by -baseline in x.
    M2 = M1.at[0, 3].add(-baseline)
    return K @ M1, K @ M2


def monocular_project(calib: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Left-camera-only pixel projection (..., 3) -> (..., 2) = (u, v)."""
    fx, fy, cx, cy, _ = (calib[..., i] for i in range(5))
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return jnp.stack([fx * x * inv_z + cx, fy * y * inv_z + cy], axis=-1)
