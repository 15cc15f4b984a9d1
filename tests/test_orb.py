"""ORB-family detector tests (FAST-9 + steered BRIEF, ops/orb.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.ops import matching, orb
from tests.test_features_matching import textured_image


def test_fast_response_matches_bruteforce():
    """Dense log-doubling segment test == explicit per-start-position FAST."""
    img = np.asarray(textured_image(jax.random.PRNGKey(0), h=32, w=48))
    got = np.asarray(orb.fast_response(jnp.asarray(img), threshold=0.04))
    want = orb.fast_response_ref(img, threshold=0.04)
    # compare away from the wrap-around ring band
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                               rtol=1e-5, atol=1e-6)


def test_fast_fires_on_corners_not_flats():
    # bright square on dark background: corners of the square are FAST
    # corners, the flat interior/exterior and straight edges are not
    img = jnp.zeros((64, 64)).at[20:44, 20:44].set(1.0)
    resp = np.asarray(orb.fast_response(img, threshold=0.1))
    assert resp[20, 20] > 0 and resp[20, 43] > 0 and resp[43, 43] > 0
    assert resp[32, 32] == 0          # flat interior
    assert resp[10, 10] == 0          # flat exterior
    assert resp[20, 32] == 0          # straight edge midpoint


def test_orb_detects_and_describes():
    img = textured_image(jax.random.PRNGKey(1), h=128, w=256)
    out = orb.detect_and_describe_orb(img, max_kp=256)
    assert out["xy"].shape == (256, 2)
    assert out["desc"].shape == (256, 128)
    assert int(jnp.sum(out["valid"])) > 50
    # descriptors are ±1/sqrt(128) bit signs -> unit norm on valid slots
    v = np.asarray(out["valid"])
    norms = np.linalg.norm(np.asarray(out["desc"])[v], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_orb_matches_shifted_image():
    img = textured_image(jax.random.PRNGKey(2), h=128, w=256)
    shifted = jnp.roll(img, -6, axis=1)
    a = orb.detect_and_describe_orb(img, max_kp=256)
    b = orb.detect_and_describe_orb(shifted, max_kp=256)
    m = matching.mutual_match(a["desc"], b["desc"], a["valid"], b["valid"],
                              max_dist=4.0 * 40.0 / 128.0)
    matched = np.asarray(m["matched"])
    assert matched.sum() > 20
    ia = np.nonzero(matched)[0]
    ib = np.asarray(m["target_idx"])[ia]
    dx = np.asarray(b["xy"])[ib, 0] - np.asarray(a["xy"])[ia, 0]
    assert np.mean(np.abs(dx + 6) < 2) > 0.7


def test_brief_steering_is_rotation_invariant():
    """The same physical point described in a 90°-rotated image yields
    (nearly) the same bits: the intensity centroid rotates with the image
    and the pattern steering compensates."""
    img = textured_image(jax.random.PRNGKey(3), h=128, w=128)
    H, W = img.shape
    rot = jnp.asarray(np.rot90(np.asarray(img)))   # new[W-1-x, y] = old[y, x]

    out = orb.detect_and_describe_orb(img, max_kp=128)
    v = np.asarray(out["valid"])
    xy = np.asarray(out["xy"])[v]
    keep = (xy[:, 0] > 20) & (xy[:, 0] < W - 20) & \
           (xy[:, 1] > 20) & (xy[:, 1] < H - 20)
    xy = xy[keep][:64]
    desc_a = np.asarray(out["desc"])[v][keep][:64]

    xy_rot = np.stack([xy[:, 1], (W - 1) - xy[:, 0]], axis=1)
    m10, m01 = orb.orientation_moment_maps(rot)
    xi = jnp.clip(jnp.round(jnp.asarray(xy_rot[:, 0])).astype(jnp.int32),
                  0, rot.shape[1] - 1)
    yi = jnp.clip(jnp.round(jnp.asarray(xy_rot[:, 1])).astype(jnp.int32),
                  0, rot.shape[0] - 1)
    angle = jnp.arctan2(m01[yi, xi], m10[yi, xi])
    from slam_tpu.ops import features as feat
    blur = feat.gaussian_blur(rot, 2.0, 4)
    desc_b = np.asarray(orb.describe_brief(
        blur, jnp.asarray(xy_rot, jnp.float32), angle,
        jnp.ones((xy_rot.shape[0],), bool)))

    # hamming = (1 - <a,b>) * D / 2 for ±1/sqrt(D) sign vectors
    ham = (1.0 - np.sum(desc_a * desc_b, axis=-1)) * 64.0
    assert np.median(ham) < 25.0, np.median(ham)   # random pairs ~ 64


@pytest.mark.slow
def test_frontend_with_orb_detector():
    from slam_tpu.config import (
        FeatureConfig, MatchConfig, RansacConfig, RuntimeConfig, SlamConfig,
    )
    from slam_tpu.models import frontend
    from slam_tpu.utils import metrics, synthetic

    cfg = SlamConfig(
        features=FeatureConfig(max_kp=384, border=8, detector="orb"),
        matching=MatchConfig(norm="hamming", max_hamming=40.0),
        ransac=RansacConfig(num_hypotheses=128),
        runtime=RuntimeConfig(chunk_frames=5),
    )
    scene = synthetic.make_scene(
        jax.random.PRNGKey(9), num_frames=10, num_landmarks=2000,
        hw=(128, 256), step_m=0.8,
    )
    L, R = synthetic.render_sequence(scene)
    res = frontend.run_frontend(L, R, scene.calib, cfg)
    assert (res.num_inliers[1:] > 10).all(), res.num_inliers
    ate = metrics.ate_rmse(res.T_w2c, np.asarray(scene.T_w2c))
    assert ate < 0.5, ate
