"""Synthetic stereo sequences with exact ground truth.

The KITTI dataset is not shipped with the repo, so correctness and
benchmarking are driven by synthetic scenes: a camera trajectory through a
field of point landmarks, rendered as Gaussian-blob stereo images with the
same resolution/calibration profile as KITTI seq 00 (1241x376,
fx=718.856, baseline=0.5372 — reference dataset described in SURVEY.md §0).

Two levels of fidelity:
  * geometry-only: exact (uL, uR, v) measurements with known 3D and poses —
    drives unit/golden tests of triangulation/PnP/BA/pose-graph/loops.
  * rendered images: blob splatting at projected landmark positions over a
    low-frequency background — drives the full image pipeline end-to-end
    (detect -> describe -> match -> RANSAC) with known ground-truth poses.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3, stereo

KITTI_CALIB = jnp.array(
    [718.856, 718.856, 607.1928, 185.2157, 0.5372], dtype=jnp.float32
)
KITTI_HW = (376, 1241)


@dataclass
class Scene:
    """A synthetic world: landmarks + ground-truth trajectory.

    Each conceptual landmark is rendered as a small 3D *cluster* of points
    (``render_points``): an isolated isotropic dot produces identical
    descriptors for every landmark, so matching would be random; a unique
    satellite constellation per landmark is view-consistent texture that
    descriptors can discriminate.
    """

    landmarks: jnp.ndarray   # (M, 3) world points (the GT geometry)
    intensities: jnp.ndarray  # (M,) blob brightness
    T_w2c: jnp.ndarray       # (F, 4, 4) ground-truth extrinsics per frame
    calib: jnp.ndarray       # [fx, fy, cx, cy, baseline]
    hw: tuple[int, int]
    render_points: jnp.ndarray | None = None   # (M*S, 3) textured cluster
    render_intens: jnp.ndarray | None = None   # (M*S,)


def straight_trajectory(num_frames: int, step_m: float = 1.0) -> jnp.ndarray:
    """Forward motion along +z with mild lateral sway. Returns T_w2c (F,4,4)."""
    t = jnp.arange(num_frames, dtype=jnp.float32)
    x = 0.5 * jnp.sin(t * 0.05)
    yaw = 0.02 * jnp.sin(t * 0.03)
    z = t * step_m
    R = se3.so3_exp(jnp.stack([jnp.zeros_like(yaw), yaw, jnp.zeros_like(yaw)], -1))
    centers = jnp.stack([x, jnp.zeros_like(x), z], axis=-1)  # camera centers
    # T_w2c = [R^T, -R^T c]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3.make_T(Rt, -jnp.einsum("fij,fj->fi", Rt, centers))


def loop_trajectory(num_frames: int, radius: float = 60.0) -> jnp.ndarray:
    """Closed circular loop (revisits the start) for loop-closure tests.

    Parametrized so the camera starts at the origin looking along +z and
    drives the circle counter-clockwise (circle center at (radius, 0) in
    the x-z plane); yaw equals the path angle so the camera always faces
    the tangent.
    """
    ang = jnp.linspace(0.0, 2.0 * jnp.pi, num_frames)
    cx = radius * (1.0 - jnp.cos(ang))
    cz = radius * jnp.sin(ang)
    centers = jnp.stack([cx, jnp.zeros_like(cx), cz], axis=-1)
    yaw = ang
    R = se3.so3_exp(jnp.stack([jnp.zeros_like(yaw), yaw, jnp.zeros_like(yaw)], -1))
    Rt = jnp.swapaxes(R, -1, -2)
    return se3.make_T(Rt, -jnp.einsum("fij,fj->fi", Rt, centers))


def make_scene(
    key: jax.Array,
    num_frames: int = 50,
    num_landmarks: int = 4000,
    trajectory: str = "straight",
    hw: tuple[int, int] = (192, 320),
    calib: jnp.ndarray | None = None,
    step_m: float = 1.0,
    corridor_halfwidth: float = 25.0,
    loop_radius: float = 25.0,
) -> Scene:
    if calib is None:
        # scale KITTI intrinsics to the requested resolution
        sy = hw[0] / KITTI_HW[0]
        sx = hw[1] / KITTI_HW[1]
        calib = jnp.array(
            [
                718.856 * sx,
                718.856 * sy,
                607.1928 * sx,
                185.2157 * sy,
                0.5372,
            ],
            dtype=jnp.float32,
        )
    if trajectory == "straight":
        T_w2c = straight_trajectory(num_frames, step_m)
        length = num_frames * step_m
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lx = jax.random.uniform(k1, (num_landmarks,), minval=-corridor_halfwidth,
                                maxval=corridor_halfwidth)
        ly = jax.random.uniform(k2, (num_landmarks,), minval=-4.0, maxval=4.0)
        lz = jax.random.uniform(k3, (num_landmarks,), minval=-10.0,
                                maxval=length + 60.0)
        landmarks = jnp.stack([lx, ly, lz], axis=-1)
    elif trajectory == "loop":
        T_w2c = loop_trajectory(num_frames, radius=loop_radius)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # landmarks in an annulus around the circular path
        ang = jax.random.uniform(k1, (num_landmarks,), maxval=2.0 * jnp.pi)
        half = 0.6 * loop_radius
        rad = loop_radius + jax.random.uniform(
            k2, (num_landmarks,), minval=-half, maxval=half
        )
        ly = jax.random.uniform(k3, (num_landmarks,), minval=-4.0, maxval=4.0)
        # annulus around the circle's center at (loop_radius, 0) in x-z
        landmarks = jnp.stack(
            [loop_radius - rad * jnp.cos(ang), ly, rad * jnp.sin(ang)], axis=-1
        )
    else:
        raise ValueError(f"unknown trajectory {trajectory!r}")
    intens = 0.4 + 0.6 * jax.random.uniform(k4, (num_landmarks,))

    # unique satellite constellation per landmark (see Scene docstring):
    # the primary point plus S-1 satellites at random 3D offsets
    S = 4
    ko, ki = jax.random.split(jax.random.fold_in(key, 7))
    offsets = jax.random.uniform(ko, (num_landmarks, S - 1, 3),
                                 minval=-0.2, maxval=0.2)
    sats = landmarks[:, None, :] + offsets
    render_points = jnp.concatenate(
        [landmarks[:, None, :], sats], axis=1
    ).reshape(-1, 3)
    sat_int = intens[:, None] * (
        0.5 + 0.5 * jax.random.uniform(ki, (num_landmarks, S - 1))
    )
    render_intens = jnp.concatenate(
        [intens[:, None], sat_int], axis=1
    ).reshape(-1)
    return Scene(landmarks, intens, T_w2c, calib, hw,
                 render_points=render_points, render_intens=render_intens)


# ---------------------------------------------------------------------------
# exact geometry observations (no images)
# ---------------------------------------------------------------------------

def observe_frame(
    scene: Scene, frame: int, noise_px: float = 0.0, key: jax.Array | None = None
):
    """Exact stereo measurements of all visible landmarks in one frame.

    Returns (meas (M,3) = (uL,uR,v), visible (M,) bool, pts_cam (M,3)).
    """
    T = scene.T_w2c[frame]
    pc = se3.transform_points(T, scene.landmarks)
    meas = stereo.project(scene.calib, pc)
    H, W = scene.hw
    vis = (
        (pc[:, 2] > 1.0)
        & (pc[:, 2] < 200.0)
        & (meas[:, 0] >= 0) & (meas[:, 0] < W)
        & (meas[:, 1] >= 0) & (meas[:, 1] < W)
        & (meas[:, 2] >= 0) & (meas[:, 2] < H)
    )
    if noise_px > 0.0 and key is not None:
        meas = meas + noise_px * jax.random.normal(key, meas.shape)
    return meas, vis, pc


# ---------------------------------------------------------------------------
# image rendering (blob splatting)
# ---------------------------------------------------------------------------

def _splat(hw, us, vs, weights, radius: int = 2, sigma: float = 1.0):
    """Render Gaussian blobs at continuous (u, v) via bilinear-free stamped
    scatter-add: a (2r+1)^2 static loop of .at[].add with subpixel-shifted
    Gaussian weights."""
    H, W = hw
    img = jnp.zeros((H, W), jnp.float32)
    ui = jnp.floor(us).astype(jnp.int32)
    vi = jnp.floor(vs).astype(jnp.int32)
    fu = us - ui
    fv = vs - vi
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w = weights * jnp.exp(
                -((dx - fu) ** 2 + (dy - fv) ** 2) / (2.0 * sigma * sigma)
            )
            x = jnp.clip(ui + dx, 0, W - 1)
            y = jnp.clip(vi + dy, 0, H - 1)
            inb = (ui + dx >= 0) & (ui + dx < W) & (vi + dy >= 0) & (vi + dy < H)
            img = img.at[y, x].add(jnp.where(inb, w, 0.0))
    return img


def render_frame(scene: Scene, frame: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render the (left, right) grayscale pair for one frame, in [0, 1]."""
    if scene.render_points is not None:
        pts = scene.render_points
        intens = scene.render_intens
    else:
        pts = scene.landmarks
        intens = scene.intensities
    T = scene.T_w2c[frame]
    pc = se3.transform_points(T, pts)
    meas = stereo.project(scene.calib, pc)
    H, W = scene.hw
    vis = (
        (pc[:, 2] > 1.0) & (pc[:, 2] < 200.0)
        & (meas[:, 0] >= 0) & (meas[:, 0] < W)
        & (meas[:, 1] >= 0) & (meas[:, 1] < W)
        & (meas[:, 2] >= 0) & (meas[:, 2] < H)
    )
    w = jnp.where(vis, intens, 0.0)
    # modulate brightness by inverse depth so blobs stay distinctive but
    # remain detectable at range
    w = w * jnp.clip(20.0 / jnp.maximum(pc[:, 2], 1.0), 0.5, 2.0)
    left = _splat(scene.hw, meas[:, 0], meas[:, 2], w)
    right = _splat(scene.hw, meas[:, 1], meas[:, 2], w)
    # weak vertical-only background gradient: keeps some image structure
    # without introducing horizontally-periodic texture (a screen-fixed
    # periodic pattern generates self-similar FALSE stereo matches whose
    # spurious disparity passes the rectified gate)
    H, W = scene.hw
    yy = jnp.linspace(0, 4 * jnp.pi, H)[:, None]
    bg = 0.02 * jnp.sin(yy + frame * 0.1) * jnp.ones((1, W))
    left = jnp.clip(left + bg + 0.05, 0.0, 1.0)
    right = jnp.clip(right + bg + 0.05, 0.0, 1.0)
    return left, right


def render_sequence(
    scene: Scene, chunk: int = 32, on_cpu: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Render all frames -> host numpy (F, H, W) float32 pairs.

    Chunked so the vmapped splatting program stays small enough to compile
    quickly; ``on_cpu=True`` forces the host backend (useful when the
    accelerator is remote and readback-bound).
    """
    F = scene.T_w2c.shape[0]
    devices = jax.devices("cpu") if on_cpu else [None]
    ctx = jax.default_device(devices[0]) if devices[0] is not None else None

    def _render_all():
        Ls, Rs = [], []
        # eager vmap (NOT jit): the 25-tap scatter-splat compiles
        # pathologically slowly as one fused program on some backends,
        # while op-by-op dispatch of the batched scatters is fast
        fn = jax.vmap(lambda f: render_frame(scene, f))
        for s in range(0, F, chunk):
            frames = jnp.arange(s, min(s + chunk, F))
            L, R = fn(frames)
            Ls.append(np.asarray(L))
            Rs.append(np.asarray(R))
        return np.concatenate(Ls), np.concatenate(Rs)

    if ctx is not None:
        with ctx:
            return _render_all()
    return _render_all()
