"""Tests for SIFT extraction and descriptor matching."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.features import matching, sift


def render_blob_image(rng, h=200, w=240, n_blobs=25, seed_offset=(0, 0)):
    """Random Gaussian blobs: repeatable, localizable features."""
    img = np.zeros((h, w), np.float64)
    ys = rng.uniform(20, h - 20, n_blobs) + seed_offset[0]
    xs = rng.uniform(20, w - 20, n_blobs) + seed_offset[1]
    sigs = rng.uniform(2.0, 5.0, n_blobs)
    amps = rng.uniform(0.4, 1.0, n_blobs) * np.sign(rng.standard_normal(n_blobs))
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x, s, a in zip(ys, xs, sigs, amps):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return img, np.stack([xs, ys], -1), sigs


SMALL_OPTS = sift.SiftOptions(max_num_features=512, candidates_per_octave=256,
                              num_octaves=3)


class TestSift:
    def test_detects_blobs(self):
        rng = np.random.default_rng(0)
        img, centers, sigs = render_blob_image(rng)
        feats = sift.extract_sift(jnp.asarray(img), SMALL_OPTS)
        kp = np.asarray(feats.keypoints)[np.asarray(feats.valid)]
        assert len(kp) >= 15, f"only {len(kp)} keypoints"
        # Most blob centers should have a keypoint nearby.
        found = 0
        for c in centers:
            d = np.linalg.norm(kp[:, :2] - c, axis=-1).min()
            found += d < 3.0
        assert found >= len(centers) * 0.6, f"{found}/{len(centers)} blobs"

    def test_descriptor_valid_range(self):
        rng = np.random.default_rng(1)
        img, _, _ = render_blob_image(rng)
        feats = sift.extract_sift(jnp.asarray(img), SMALL_OPTS)
        d = np.asarray(feats.descriptors)[np.asarray(feats.valid)]
        assert d.dtype == np.uint8
        # L1-root + 512 quantization: squared-sum ~ 512^2.
        norms = np.linalg.norm(d.astype(np.float64), axis=-1)
        assert np.all(norms > 300) and np.all(norms < 600), (
            norms.min(), norms.max())

    def test_shift_repeatability(self):
        rng = np.random.default_rng(2)
        img, centers, _ = render_blob_image(rng)
        shift = 6
        img2 = np.roll(img, (0, shift), axis=(0, 1))
        f1 = sift.extract_sift(jnp.asarray(img), SMALL_OPTS)
        f2 = sift.extract_sift(jnp.asarray(img2), SMALL_OPTS)
        res = matching.match_descriptors(f1.descriptors, f2.descriptors,
                                         f1.valid, f2.valid)
        m = np.asarray(res.matches)
        k1 = np.asarray(f1.keypoints)
        k2 = np.asarray(f2.keypoints)
        n_checked, n_good = 0, 0
        for i, j in enumerate(m):
            if j < 0:
                continue
            n_checked += 1
            dx = k2[j, 0] - k1[i, 0]
            dy = k2[j, 1] - k1[i, 1]
            if abs(dx - shift) < 1.5 and abs(dy) < 1.5:
                n_good += 1
        assert n_checked >= 10, f"only {n_checked} matches"
        assert n_good >= 0.8 * n_checked, (n_good, n_checked)


class TestMatching:
    def _make_descs(self, rng, n, scale=512):
        d = rng.dirichlet(np.ones(128) * 0.1, n)
        d = np.sqrt(d)
        return np.clip(np.round(scale * d), 0, 255).astype(np.uint8)

    def test_identity_matching(self):
        rng = np.random.default_rng(3)
        d = self._make_descs(rng, 50)
        res = matching.match_descriptors(jnp.asarray(d), jnp.asarray(d))
        m = np.asarray(res.matches)
        assert (m == np.arange(50)).all()

    def test_ratio_test_rejects_ambiguous(self):
        rng = np.random.default_rng(4)
        d = rng.dirichlet(np.ones(128), 10)
        d1 = np.clip(np.round(512 * np.sqrt(d)), 0, 255).astype(np.uint8)
        # Image 2 contains two copies with nearly identical perturbations ->
        # best and second-best distances are within the 0.8 ratio -> the
        # ratio test (sift.cc:258-299 semantics) kills (almost) all.
        n1 = rng.integers(-10, 11, d1.shape)
        n2 = n1.copy()
        for i in range(10):
            cols = rng.choice(128, 5, replace=False)
            n2[i, cols] += rng.integers(-3, 4, 5)
        d2 = np.concatenate([
            np.clip(d1.astype(int) + n1, 0, 255).astype(np.uint8),
            np.clip(d1.astype(int) + n2, 0, 255).astype(np.uint8)])
        res = matching.match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
        assert int(res.num_matches) <= 2

    def test_cross_check(self):
        rng = np.random.default_rng(5)
        d1 = self._make_descs(rng, 30)
        d2 = self._make_descs(rng, 30)
        d2[:10] = d1[:10]  # 10 true matches
        res = matching.match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
        m = np.asarray(res.matches)
        assert (m[:10] == np.arange(10)).all()

    def test_validity_masks(self):
        rng = np.random.default_rng(6)
        d1 = self._make_descs(rng, 20)
        d2 = np.concatenate([d1, np.zeros((10, 128), np.uint8)])
        v2 = np.asarray([True] * 20 + [False] * 10)
        res = matching.match_descriptors(
            jnp.asarray(d1), jnp.asarray(d2), None, jnp.asarray(v2))
        m = np.asarray(res.matches)
        assert (m < 20).all()
        assert (m[:20] == np.arange(20)).all()

    def test_match_many_pairs(self):
        rng = np.random.default_rng(7)
        descs = np.stack([self._make_descs(rng, 16) for _ in range(4)])
        descs[1] = descs[0]
        valid = np.ones((4, 16), bool)
        pairs = jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32)
        res = matching.match_many_pairs(jnp.asarray(descs),
                                        jnp.asarray(valid), pairs)
        m = np.asarray(res.matches)
        assert (m[0] == np.arange(16)).all()


class TestDspSift:
    def test_dsp_descriptors_match_across_shift(self):
        """DSP-SIFT (domain-size pooling, sift.cc:677-726): pooled
        descriptors remain valid uint8 and match across a shift."""
        rng = np.random.default_rng(4)
        img, _, _ = render_blob_image(rng)
        opts = SMALL_OPTS._replace(domain_size_pooling=True,
                                   dsp_num_scales=4)
        shift = 6
        img2 = np.roll(img, (0, shift), axis=(0, 1))
        f1 = sift.extract_sift(jnp.asarray(img), opts)
        f2 = sift.extract_sift(jnp.asarray(img2), opts)
        d = np.asarray(f1.descriptors)[np.asarray(f1.valid)]
        assert d.dtype == np.uint8 and len(d) >= 10
        norms = np.linalg.norm(d.astype(np.float64), axis=-1)
        assert np.all(norms > 300) and np.all(norms < 600)
        res = matching.match_descriptors(f1.descriptors, f2.descriptors,
                                         f1.valid, f2.valid)
        idx2 = np.asarray(res.matches)
        kp1 = np.asarray(f1.keypoints)
        kp2 = np.asarray(f2.keypoints)
        rows = np.nonzero(idx2 >= 0)[0]
        assert len(rows) >= 10, f"only {len(rows)} DSP matches"
        dx = kp2[idx2[rows], 0] - kp1[rows, 0]
        good = np.abs(dx - shift) < 1.5
        assert good.mean() > 0.7, f"{good.mean():.2f} shift-consistent"


class TestAffineSift:
    def test_affine_adaptation_matches_under_anisotropic_stretch(self):
        """Covariant detector (vl_covdet role, sift.cc:575-745): with
        affine shape adaptation the descriptors stay matchable under an
        anisotropic stretch of the image."""
        rng = np.random.default_rng(9)
        img, _, _ = render_blob_image(rng, h=200, w=200)
        # 1.4x horizontal stretch (keep size by cropping).
        import jax.image as jimage
        stretched = np.asarray(jimage.resize(
            jnp.asarray(img), (200, 280), "bilinear"))[:, 40:240]
        opts = SMALL_OPTS._replace(estimate_affine_shape=True)
        f1 = sift.extract_sift(jnp.asarray(img), opts)
        f2 = sift.extract_sift(jnp.asarray(stretched), opts)
        assert int(np.asarray(f1.valid).sum()) >= 10
        res = matching.match_descriptors(f1.descriptors, f2.descriptors,
                                         f1.valid, f2.valid)
        n_affine = int(np.asarray(res.matches >= 0).sum())
        assert n_affine >= 8, f"only {n_affine} affine matches"


def test_extract_and_lift_jit_matches_eager():
    """The cached-jit front-end wrapper (extraction.extract_and_lift_jit)
    agrees with the eager path: same valid count, >=95% identical lifted
    lines (fp reassociation under fusion may flip a few borderline DoG
    extrema; bitwise stability is not a SIFT property)."""
    import jax
    import jax.numpy as jnp

    from privacy_preserving_sfm_tpu.features import extraction, sift

    rng = np.random.default_rng(3)
    img = jnp.asarray(render_blob_image(rng)[0], jnp.float32)
    key = jax.random.PRNGKey(0)
    opts = sift.SiftOptions(max_num_features=256, first_octave=0)
    g = jnp.asarray([0.0, -1.0, 0.0])
    par = jnp.asarray([300.0, float(img.shape[1]) / 2,
                       float(img.shape[0]) / 2])
    lf_e = extraction.extract_and_lift(key, img, "SIMPLE_PINHOLE", par, g,
                                       opts)
    lf_j = extraction.extract_and_lift_jit(key, img, "SIMPLE_PINHOLE", par,
                                           g, opts)
    ve = np.asarray(lf_e.valid)
    vj = np.asarray(lf_j.valid)
    assert abs(int(ve.sum()) - int(vj.sum())) <= max(2, 0.05 * ve.sum())
    n = min(ve.sum(), vj.sum())
    le = np.asarray(lf_e.lines)[ve][:n]
    lj = np.asarray(lf_j.lines)[vj][:n]
    same = np.abs(le - lj).max(axis=1) < 1e-4
    assert same.mean() >= 0.95
