"""TPU-native feature detection + description.

Replaces the OpenCV C++ detectors/descriptors the reference binds to
(``cv2.SIFT_create(2500)`` / ``cv2.AKAZE_create`` — reference
final_project/algorithms/matching.py:19-35) with a batched, static-shape
pipeline designed for the MXU/VPU:

  * detection:  multi-scale Harris corner response computed with
    depthwise convolutions (XLA maps these onto the MXU), 3x3 non-max
    suppression via max-pooling, and a *gridded top-K* selection that
    returns a fixed number of keypoints per image with a validity mask
    (static shapes — no data-dependent keypoint counts).
  * description: a SIFT-style 4x4x8 gradient-orientation-histogram
    descriptor (128-d float) sampled on a 16x16 patch around each keypoint.
    It is computed for ALL keypoints of ALL images in one batched gather +
    one-hot-matmul pass, which makes descriptor matching downstream a pure
    bf16 matmul on the MXU.

Exact OpenCV descriptor bit-parity is a non-goal (SURVEY.md §7.3): the
parity target is pipeline metrics (ATE / fps), and these detectors feed the
same downstream geometry.

All entry points are jit/vmap-friendly; images are (H, W) float32 in [0,1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Default budget comparable to the reference's 2500 SIFT features
# (matching.py:31); rounded to a power of two for clean tiling.
DEFAULT_MAX_KP = 2048
PATCH = 16  # descriptor patch side
DESC_DIM = 128


# ---------------------------------------------------------------------------
# small separable convolutions
# ---------------------------------------------------------------------------

def _conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2D 'same' convolution of (H, W) with a small (kh, kw) kernel."""
    return jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int = 3) -> jnp.ndarray:
    k = _gaussian_kernel1d(sigma, radius)
    img = _conv2d_same(img, k[None, :])
    return _conv2d_same(img, k[:, None])


def _sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
    gx = _conv2d_same(img, kx)
    gy = _conv2d_same(img, kx.T)
    return gx, gy


# ---------------------------------------------------------------------------
# Harris detection with gridded top-K
# ---------------------------------------------------------------------------

def harris_response(img: jnp.ndarray, k: float = 0.05) -> jnp.ndarray:
    """Harris corner response map (H, W)."""
    gx, gy = _sobel(img)
    gxx = gaussian_blur(gx * gx, 1.5, 2)
    gyy = gaussian_blur(gy * gy, 1.5, 2)
    gxy = gaussian_blur(gx * gy, 1.5, 2)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    return det - k * tr * tr


def _nms(resp: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Zero out non-maxima within a (2r+1)^2 window."""
    m = jax.lax.reduce_window(
        resp,
        -jnp.inf,
        jax.lax.max,
        (2 * radius + 1, 2 * radius + 1),
        (1, 1),
        "SAME",
    )
    return jnp.where(resp >= m, resp, -jnp.inf)


@partial(jax.jit, static_argnames=("max_kp", "cell", "border"))
def detect(
    img: jnp.ndarray,
    max_kp: int = DEFAULT_MAX_KP,
    cell: int = 16,
    border: int = 12,
    min_response: float = 1e-7,
):
    """Detect up to ``max_kp`` corners on one image.

    A uniform spatial distribution matters more for odometry stability than
    raw response ranking, so selection is *gridded*: the response map is cut
    into ``cell`` x ``cell`` tiles, the best corner of every tile is taken
    first, then remaining slots are filled by global response order. Here
    this is implemented as a single global top-K over tile-normalized
    responses — one ``lax.top_k``, no loops.

    Returns dict with xy (max_kp, 2) float32 pixel coords, resp (max_kp,),
    valid (max_kp,) bool.
    """
    H, W = img.shape
    resp = harris_response(img)
    resp = _nms(resp)

    # border + validity mask
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (
        (xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border)
    )
    resp = jnp.where(in_border & (resp > min_response), resp, -jnp.inf)

    # tile-normalize: rank = resp / tile_max, so every tile's best point gets
    # score 1.0 and competes globally ahead of any tile's second-best.
    Hp = (H + cell - 1) // cell * cell
    Wp = (W + cell - 1) // cell * cell
    rp = jnp.pad(resp, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf)
    tiles = rp.reshape(Hp // cell, cell, Wp // cell, cell)
    tmax = jnp.max(tiles, axis=(1, 3), keepdims=True)
    tmax = jnp.where(jnp.isfinite(tmax), tmax, 1.0)
    normed = jnp.where(
        jnp.isfinite(tiles), tiles / jnp.maximum(tmax, 1e-12), -jnp.inf
    )
    normed = normed.reshape(Hp, Wp)[:H, :W]

    flat = normed.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_kp)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = jnp.isfinite(vals)
    return {
        "xy": jnp.stack([xs, ys], axis=-1),
        "resp": jnp.where(valid, resp.reshape(-1)[idx], 0.0),
        "valid": valid,
    }


# ---------------------------------------------------------------------------
# SIFT-style descriptor (upright, single scale)
# ---------------------------------------------------------------------------

def _patch_coords() -> tuple[jnp.ndarray, jnp.ndarray]:
    """Relative (dy, dx) grids of the 16x16 descriptor patch, centered."""
    r = jnp.arange(PATCH, dtype=jnp.float32) - (PATCH - 1) / 2.0
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return dy.reshape(-1), dx.reshape(-1)


def describe(img: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """128-d SIFT-like descriptors for all keypoints of one image.

    For each keypoint: gather a 16x16 gradient patch, bin gradient
    orientations into 8 bins with soft (linear) weights, pool into a 4x4
    spatial grid, Gaussian-weight by distance from the center, L2-normalize,
    clip at 0.2, renormalize (the standard SIFT normalization).

    The orientation binning + spatial pooling is expressed as two one-hot
    matmuls so the whole thing is (K*256, 8) x (8,) style batched matrix
    work — MXU-friendly at K=2048.
    """
    K = xy.shape[0]
    blur = gaussian_blur(img, 1.0, 2)
    gx, gy = _sobel(blur)

    dy, dx = _patch_coords()  # (256,)
    px = jnp.clip(
        jnp.round(xy[:, 0:1] + dx[None, :]).astype(jnp.int32), 0, img.shape[1] - 1
    )  # (K, 256)
    py = jnp.clip(
        jnp.round(xy[:, 1:2] + dy[None, :]).astype(jnp.int32), 0, img.shape[0] - 1
    )
    g_x = gx[py, px]  # (K, 256)
    g_y = gy[py, px]

    mag = jnp.sqrt(g_x * g_x + g_y * g_y + 1e-12)
    ang = jnp.arctan2(g_y, g_x)  # [-pi, pi]

    # soft orientation binning into 8 bins
    bin_f = (ang + jnp.pi) / (2.0 * jnp.pi) * 8.0  # [0, 8]
    b0 = jnp.floor(bin_f).astype(jnp.int32) % 8
    b1 = (b0 + 1) % 8
    w1 = bin_f - jnp.floor(bin_f)
    w0 = 1.0 - w1

    # spatial cell index: 4x4 grid over the 16x16 patch
    cell_y = (dy + PATCH / 2.0) // (PATCH // 4)
    cell_x = (dx + PATCH / 2.0) // (PATCH // 4)
    cell = jnp.clip(cell_y * 4 + cell_x, 0, 15).astype(jnp.int32)  # (256,)

    # Gaussian center weighting
    gw = jnp.exp(-(dx * dx + dy * dy) / (2.0 * (PATCH / 2.0) ** 2))  # (256,)

    # accumulate desc[k, cell, bin] += mag * w * gw as two matmuls:
    #   orient[k, p, o] — soft orientation one-hot weighted by magnitude
    #   cellmask[p, c]  — fixed patch-position -> spatial-cell indicator
    # then desc[k, c, o] = cellmask^T @ orient (contraction over p=256),
    # a K-batched (16x256)@(256x8) matmul that rides the MXU.
    contrib = mag * gw[None, :]
    orient = (
        jax.nn.one_hot(b0, 8, dtype=img.dtype) * (contrib * w0)[..., None]
        + jax.nn.one_hot(b1, 8, dtype=img.dtype) * (contrib * w1)[..., None]
    )  # (K, 256, 8)
    cellmask = jax.nn.one_hot(cell, 16, dtype=img.dtype)  # (256, 16)
    desc = jnp.einsum("pc,kpo->kco", cellmask, orient).reshape(K, DESC_DIM)

    # SIFT normalization: L2 -> clip 0.2 -> L2
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return jnp.where(valid[:, None], desc, 0.0)


@partial(jax.jit, static_argnames=("max_kp",))
def detect_and_describe(img: jnp.ndarray, max_kp: int = DEFAULT_MAX_KP):
    """cv2 ``detectAndCompute`` equivalent for one image (jit, static out).

    Returns dict: xy (max_kp, 2), desc (max_kp, 128), valid (max_kp,).
    """
    det = detect(img, max_kp=max_kp)
    desc = describe(img, det["xy"], det["valid"])
    return {"xy": det["xy"], "desc": desc, "valid": det["valid"], "resp": det["resp"]}


# Batched over a stack of images: (B, H, W) -> pytree with leading B.
detect_and_describe_batched = jax.vmap(detect_and_describe, in_axes=(0,))
