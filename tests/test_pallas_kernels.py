"""Fused matching kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import features, matching, pallas_kernels


def unit_desc(key, n, d=128):
    x = jax.random.normal(key, (n, d))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def test_nearest_neighbor_matches_dense():
    ka, kb = 1024, 1024
    a = unit_desc(jax.random.PRNGKey(0), ka)
    b = unit_desc(jax.random.PRNGKey(1), kb)
    valid_b = jnp.arange(kb) % 7 != 0  # some invalid columns
    dist, idx = pallas_kernels.nearest_neighbor(a, b, valid_b, interpret=True)

    dmat = np.asarray(matching.distance_matrix(
        a, b, jnp.ones(ka, bool), valid_b))
    # reference computed in bf16; kernel in f32 — compare via argmin target
    ref_idx = dmat.argmin(axis=1)
    agree = (np.asarray(idx) == ref_idx).mean()
    assert agree > 0.97  # bf16-vs-f32 ties may differ on a few rows
    # distances match the exact values to bf16 matmul precision
    a_np, b_np = np.asarray(a), np.asarray(b)
    d_exact = 2.0 - 2.0 * a_np @ b_np[np.asarray(idx)].T
    np.testing.assert_allclose(
        np.asarray(dist), np.diag(d_exact), atol=3e-2
    )
    # invalid columns never chosen
    assert (np.asarray(idx) % 7 != 0).all()


def test_windowed_matching_restricts_candidates():
    """Guided window: candidates outside the spatial box never match."""
    ka = kb = 1024
    a = unit_desc(jax.random.PRNGKey(10), ka)
    b = a  # identical descriptors -> matching decided by the window
    rng = np.random.default_rng(0)
    xy_a = jnp.asarray(rng.uniform(0, 1000, (ka, 2)).astype(np.float32))
    xy_b = xy_a + jnp.asarray([50.0, 0.0])  # uniform +50px x shift
    va = jnp.ones(ka, bool)

    from slam_tpu.ops import matching

    # window admits the true +50px shift
    m_ok = matching.mutual_match(a, b, va, va, xy_a=xy_a, xy_b=xy_b,
                                 window=(0.0, 100.0, 5.0))
    assert np.asarray(m_ok["matched"]).mean() > 0.95
    assert (np.asarray(m_ok["target_idx"])[np.asarray(m_ok["matched"])] ==
            np.arange(ka)[np.asarray(m_ok["matched"])]).all()
    # window that excludes the shift: nothing matches
    m_bad = matching.mutual_match(a, b, va, va, xy_a=xy_a, xy_b=xy_b,
                                  window=(-100.0, 0.0, 5.0),
                                  max_dist=1.0)
    assert np.asarray(m_bad["matched"]).sum() == 0


def test_windowed_pallas_matches_jnp_windowed():
    ka = kb = 1024
    a = unit_desc(jax.random.PRNGKey(11), ka)
    perm = jax.random.permutation(jax.random.PRNGKey(12), ka)
    b = a[perm]
    rng = np.random.default_rng(1)
    xy_a = jnp.asarray(rng.uniform(0, 500, (ka, 2)).astype(np.float32))
    xy_b = xy_a[perm] + jnp.asarray([20.0, 3.0])
    va = jnp.ones(ka, bool)
    win = (0.0, 40.0, 6.0)

    from slam_tpu.ops import matching

    ref = matching.distance_matrix(a, b, va, va)
    ref = ref + matching.window_penalty(xy_a, xy_b, win)
    ref_idx = np.asarray(jnp.argmin(ref, axis=1))

    out = pallas_kernels.mutual_match_pallas(
        a, b, va, va, xy_a=xy_a, xy_b=xy_b, window=win, interpret=True
    )
    matched = np.asarray(out["matched"])
    assert matched.mean() > 0.95
    assert (np.asarray(out["target_idx"])[matched] == ref_idx[matched]).all()


def test_mutual_match_pallas_matches_jnp():
    ka = kb = 1024
    a = unit_desc(jax.random.PRNGKey(2), ka)
    # b = noisy permutation of a -> strong mutual structure
    perm = jax.random.permutation(jax.random.PRNGKey(3), ka)
    b = a[perm] + 0.01 * jax.random.normal(jax.random.PRNGKey(4), a.shape)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    va = jnp.ones(ka, bool)
    vb = jnp.ones(kb, bool)

    ref = matching.mutual_match(a, b, va, vb)
    out = pallas_kernels.mutual_match_pallas(a, b, va, vb, interpret=True)
    r_t = np.asarray(ref["target_idx"])
    o_t = np.asarray(out["target_idx"])
    # identical matches on virtually all rows (bf16 ties aside)
    assert (r_t == o_t).mean() > 0.99
    # and the expected permutation recovered
    inv = np.empty(ka, np.int64)
    inv[np.asarray(perm)] = np.arange(ka)
    assert (o_t == inv).mean() > 0.99


def test_pallas_harris_matches_f32_reference():
    """The fused Harris kernel must match the jnp pipeline run at PINNED
    f32 precision (the jnp path's default-precision convs are bf16-level
    on TPU — the kernel is the more accurate of the two)."""
    import jax

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 120, 200)).astype(np.float32))
    resp, nms = pallas_kernels.harris_response_batch(imgs, interpret=True)
    with jax.default_matmul_precision("float32"):
        ref = jax.vmap(features.harris_response)(imgs)
        nref = jax.vmap(features._nms)(ref)
    d = np.abs(np.asarray(resp) - np.asarray(ref))[:, 6:-6, 6:-6]
    assert d.max() < 2e-5, d.max()
    keep_p = np.isfinite(np.asarray(nms))[:, 12:-12, 12:-12]
    keep_r = np.isfinite(np.asarray(nref))[:, 12:-12, 12:-12]
    frac = (keep_p != keep_r).mean()
    assert frac < 5e-3, frac  # near-tie flips only


def test_pallas_akaze_octave_matches_jnp():
    """Fused diffusion+Hessian+NMS octave vs the jnp reference. The wrap
    halos reproduce jnp.roll semantics, so L and resp must agree over the
    FULL image (borders included); only the NMS border band (<=2 px,
    -inf-pad vs wrap) is excluded."""
    from slam_tpu.ops import akaze

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((2, 130, 200)).astype(np.float32))
    k = jax.vmap(akaze._contrast_k)(imgs)
    sigma = 1.6
    L, resp, nms = pallas_kernels.akaze_octave_batch(
        imgs, k, steps=6, sigma=sigma, interpret=True
    )
    with jax.default_matmul_precision("float32"):
        L_ref = jax.vmap(lambda im, kk: akaze.diffuse(im, kk, 6))(imgs, k)
        r_ref = jax.vmap(
            lambda l: akaze._hessian_response(l, sigma))(L_ref)
        n_ref = jax.vmap(features._nms)(r_ref)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(resp), np.asarray(r_ref),
                               atol=1e-5, rtol=0)
    keep_p = np.isfinite(np.asarray(nms))[:, 3:-3, 3:-3]
    keep_r = np.isfinite(np.asarray(n_ref))[:, 3:-3, 3:-3]
    frac = (keep_p != keep_r).mean()
    assert frac < 1e-3, frac  # near-tie flips only


def test_pallas_orientation_maps_match_f32_reference():
    import jax

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.random((1, 130, 200)).astype(np.float32))
    maps = pallas_kernels.orientation_cell_maps_batch(imgs, interpret=True)
    with jax.default_matmul_precision("float32"):
        ref = jax.vmap(features.orientation_cell_maps)(imgs)
    d = np.abs(np.asarray(maps) - np.asarray(ref))[:, :, 8:-8, 8:-8]
    assert d.max() < 1e-4, d.max()


def test_pallas_detect_maps_matches_standalone_kernels():
    """The fused detection-maps kernel must reproduce the two standalone
    kernels exactly (identical bodies, one DMA): resp/nms/maps bit-equal
    in interpret mode."""
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.random((2, 130, 210)).astype(np.float32))
    resp_f, nms_f, maps_f = pallas_kernels.detect_maps_batch(
        imgs, interpret=True)
    resp_s, nms_s = pallas_kernels.harris_response_batch(
        imgs, interpret=True)
    maps_s = pallas_kernels.orientation_cell_maps_batch(
        imgs, interpret=True)
    np.testing.assert_array_equal(np.asarray(resp_f), np.asarray(resp_s))
    np.testing.assert_array_equal(np.asarray(nms_f), np.asarray(nms_s))
    np.testing.assert_array_equal(np.asarray(maps_f), np.asarray(maps_s))


def test_pallas_detect_maps_shifted_matches_jnp_builder():
    """detect_maps_batch(shifted=True) must reproduce
    features.build_shifted_cell_maps applied to its own unshifted maps —
    bit-equal after the single bf16 store round — for x in [6, W-7] (the
    region descriptor sampling can reach given the border-12 keypoint
    guarantee). resp/nms must be untouched by the maps-layout switch."""
    import jax

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.random((2, 90, 210)).astype(np.float32))
    resp_u, nms_u, maps8 = pallas_kernels.detect_maps_batch(
        imgs, interpret=True)
    resp_s, nms_s, maps32 = pallas_kernels.detect_maps_batch(
        imgs, interpret=True, shifted=True)
    assert maps32.shape == (2, 32, 90, 210)
    assert maps32.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(resp_s), np.asarray(resp_u))
    np.testing.assert_array_equal(np.asarray(nms_s), np.asarray(nms_u))
    ref = jax.vmap(features.build_shifted_cell_maps)(maps8).astype(
        jnp.bfloat16)
    W = imgs.shape[2]
    got = np.asarray(maps32)[:, :, :, 6 : W - 6]
    exp = np.asarray(ref)[:, :, :, 6 : W - 6]
    np.testing.assert_array_equal(got, exp)


def test_pallas_orient_maps_shifted_matches_jnp_builder():
    """orientation_cell_maps_batch(shifted=True) (the AKAZE descriptor
    path) must match the jnp shifted-stack builder on its own unshifted
    output, bit-equal after the bf16 store round, for x in [6, W-7]."""
    import jax

    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.random((2, 90, 210)).astype(np.float32))
    maps8 = pallas_kernels.orientation_cell_maps_batch(imgs, interpret=True)
    maps32 = pallas_kernels.orientation_cell_maps_batch(
        imgs, interpret=True, shifted=True)
    assert maps32.shape == (2, 32, 90, 210)
    assert maps32.dtype == jnp.bfloat16
    ref = jax.vmap(features.build_shifted_cell_maps)(maps8).astype(
        jnp.bfloat16)
    W = imgs.shape[2]
    np.testing.assert_array_equal(
        np.asarray(maps32)[:, :, :, 6 : W - 6],
        np.asarray(ref)[:, :, :, 6 : W - 6])
