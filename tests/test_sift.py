"""DoG scale-space SIFT detector (ops/sift.py).

The reference's active detector is cv2.SIFT (matching.py:27-35,72);
these tests pin the properties that make a DoG detector one: extrema
found at the blob's own scale across octaves, scale estimates that track
blob size monotonically, sub-pixel localization, and trackable frontend
output when routed via FeatureConfig(detector="sift").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_tpu.ops import sift

BLOBS = [(40, 50, 2.5), (40, 150, 2.5), (120, 60, 2.5),
         (150, 200, 5.0), (90, 220, 5.0), (100, 128, 10.0)]


def _blob_image(H=192, W=256, blobs=BLOBS, amp=0.45):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.full((H, W), 0.4, np.float32)
    for cy, cx, s in blobs:
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img


@pytest.fixture(scope="module")
def detections():
    out = sift.detect_and_describe_sift(
        jnp.asarray(_blob_image()), max_kp=1024, octaves=4)
    return {k: np.asarray(v) for k, v in out.items()}


def test_blobs_found_at_subpixel_accuracy(detections):
    xy = detections["xy"][detections["valid"]]
    for cy, cx, s in BLOBS:
        d = np.linalg.norm(xy - [cx, cy], axis=1).min()
        assert d < 1.0, f"blob ({cy},{cx},s={s}) nearest kp {d:.2f} px away"


def test_scale_estimates_track_blob_size(detections):
    v = detections["valid"]
    xy, sc = detections["xy"][v], detections["scale"][v]
    est = {}
    for cy, cx, s in BLOBS:
        i = np.linalg.norm(xy - [cx, cy], axis=1).argmin()
        est.setdefault(s, []).append(sc[i])
    means = {s: np.mean(e) for s, e in est.items()}
    # monotone in blob size and proportional within ~25% of a single
    # shared factor (DoG-vs-LoG + kernel truncation bias is systematic)
    assert means[2.5] < means[5.0] < means[10.0]
    ratios = np.array([means[s] / s for s in (2.5, 5.0, 10.0)])
    assert ratios.max() / ratios.min() < 1.25, ratios


def test_contract_shapes_and_batch():
    imgs = jnp.asarray(np.stack([_blob_image(), _blob_image()[::-1]]))
    out = sift.detect_and_describe_sift_batch(imgs, max_kp=512, octaves=3)
    assert out["xy"].shape == (2, 512, 2)
    assert out["desc"].shape == (2, 512, 128)
    assert out["valid"].shape == (2, 512)
    assert out["scale"].shape == (2, 512)
    # descriptors are SIFT-normalized: unit L2 where valid
    n = np.linalg.norm(np.asarray(out["desc"][0]), axis=-1)
    v = np.asarray(out["valid"][0])
    assert np.allclose(n[v], 1.0, atol=1e-3)
    assert np.all(n[~v] == 0.0)


def test_flat_image_yields_no_keypoints():
    img = jnp.full((128, 160), 0.5, jnp.float32)
    out = sift.detect_and_describe_sift(img, max_kp=256, octaves=3)
    assert int(np.asarray(out["valid"]).sum()) == 0


def test_frontend_routing_sift():
    """detector='sift' runs end-to-end through the frontend and tracks."""
    from slam_tpu.config import (
        FeatureConfig, RansacConfig, RuntimeConfig, SlamConfig,
    )
    from slam_tpu.models import frontend
    from slam_tpu.utils import metrics, synthetic

    cfg = SlamConfig(
        features=FeatureConfig(detector="sift", max_kp=768, num_levels=3),
        ransac=RansacConfig(num_hypotheses=128),
        runtime=RuntimeConfig(chunk_frames=5),
    )
    # the textured (natural-image-statistics) scene: DoG needs scale-space
    # extrema, which the corner-only blob texture structurally lacks
    scene = synthetic.make_scene(
        jax.random.PRNGKey(9), num_frames=10, num_landmarks=2000,
        hw=(128, 256), step_m=0.8, texture="fractal",
    )
    L, R = synthetic.render_sequence(scene)
    fe = frontend.run_frontend(L, R, scene.calib, cfg)
    assert fe.num_pose_failures <= 1
    ate = metrics.ate_rmse(fe.T_w2c, np.asarray(scene.T_w2c))
    assert ate < 1.0, ate
