"""Tests for the ORB feature engine: FAST, extractor, matching, stereo."""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig, OrbConfig, CapacityConfig
from object_slam_tpu.features import fast, matching, stereo
from object_slam_tpu.features.extractor import OrbExtractor, make_pattern


def square_image(h=120, w=160):
    """Dark background with one bright square — its 4 corners are FAST
    L-corners (checkerboard X-junctions are saddles; FAST correctly ignores
    those)."""
    img = np.full((h, w), 20.0, np.float32)
    img[40:80, 60:100] = 220.0
    return jnp.asarray(img)


def textured_image(key, h=120, w=160):
    """Random blobs -> blurred -> plenty of corners."""
    img = jax.random.uniform(key, (h // 4, w // 4)) * 255.0
    return jax.image.resize(img, (h, w), 'nearest')


class TestFast:
    def test_corner_on_square(self):
        img = square_image()
        resp = fast.detect(img, 20.0)
        assert float(jnp.max(resp)) > 0
        ys, xs = np.nonzero(np.asarray(resp))
        assert len(ys) >= 4
        # all detections near the 4 square corners
        corners = np.array([[40, 60], [40, 99], [79, 60], [79, 99]])
        for y, x in zip(ys, xs):
            d = np.min(np.abs(corners - [y, x]).sum(axis=1))
            assert d <= 4

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        resp = fast.detect(img, 20.0)
        assert float(jnp.max(resp)) == 0.0

    def test_nonmax_unique_peaks(self):
        img = textured_image(jax.random.PRNGKey(0))
        resp = fast.detect(img, 10.0)
        # NMS: every positive pixel is >= its 3x3 neighborhood
        r = np.asarray(resp)
        ys, xs = np.nonzero(r)
        for y, x in list(zip(ys, xs))[:50]:
            if 1 <= y < r.shape[0] - 1 and 1 <= x < r.shape[1] - 1:
                assert r[y, x] >= r[y - 1:y + 2, x - 1:x + 2].max() - 1e-5


def small_cfg():
    return SlamConfig(
        orb=OrbConfig(n_features=200, n_levels=4),
        caps=CapacityConfig(n_kp=256))


class TestExtractor:
    def test_extract_shapes_and_validity(self):
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=120, width=160)
        img = textured_image(jax.random.PRNGKey(1), 120, 160)
        kp = ex(img)
        assert kp.uv.shape == (256, 2)
        assert kp.desc.shape == (256, 8)
        n_valid = int(jnp.sum(kp.valid))
        assert n_valid > 50
        uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 160).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 120).all()

    def test_descriptor_stability_under_shift(self):
        """The same texture shifted a few px must produce matchable
        descriptors (the whole point of BRIEF)."""
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=120, width=160)
        img = textured_image(jax.random.PRNGKey(2), 120, 160)
        img2 = jnp.roll(img, (0, 3), axis=(0, 1))
        kp1, kp2 = ex(img), ex(img2)
        idx, m = matching.brute_match(kp1.desc, kp1.valid, kp2.desc, kp2.valid,
                                      th_dist=60, angle_a=kp1.angle,
                                      angle_b=kp2.angle)
        nm = int(jnp.sum(m))
        assert nm > 30
        # matched pairs should mostly be offset by ~(3, 0)
        du = np.asarray(kp2.uv[idx, 0] - kp1.uv[:, 0])[np.asarray(m)]
        dv = np.asarray(kp2.uv[idx, 1] - kp1.uv[:, 1])[np.asarray(m)]
        assert np.median(np.abs(du - 3)) < 1.5
        assert np.median(np.abs(dv)) < 1.5

    def test_spatial_distribution(self):
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=128, width=160)
        img = textured_image(jax.random.PRNGKey(3), 128, 160)
        kp = ex(img)
        uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
        # keypoints in all four quadrants
        for qx in (0, 1):
            for qy in (0, 1):
                inq = ((uv[:, 0] >= qx * 80) & (uv[:, 0] < (qx + 1) * 80)
                       & (uv[:, 1] >= qy * 64) & (uv[:, 1] < (qy + 1) * 64))
                assert inq.sum() > 5


class TestMatching:
    def test_hamming_matrix_basic(self):
        a = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        b = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0],
                       [0xFFFFFFFF, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        d = matching.hamming_matrix(a, b)
        assert d[0, 0] == 0 and d[0, 1] == 32

    def test_identity_match(self):
        key = jax.random.PRNGKey(0)
        desc = jax.random.bits(key, (50, 8), jnp.uint32)
        valid = jnp.ones(50, bool)
        idx, m = matching.brute_match(desc, valid, desc, valid,
                                      check_rotation=False)
        assert bool(jnp.all(m))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(50))

    def test_duplicate_resolution(self):
        # two rows both matching column 0; lower distance wins
        desc_b = jax.random.bits(jax.random.PRNGKey(1), (4, 8), jnp.uint32)
        desc_a = jnp.stack([desc_b[0],
                            desc_b[0] ^ jnp.uint32(1)])  # 1-bit off
        idx, m = matching.brute_match(desc_a, jnp.ones(2, bool),
                                      desc_b, jnp.ones(4, bool),
                                      check_rotation=False, nn_ratio=1.0)
        assert bool(m[0]) and not bool(m[1])

    def test_projection_window_gating(self):
        key = jax.random.PRNGKey(2)
        desc = jax.random.bits(key, (10, 8), jnp.uint32)
        kp_uv = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.array([[20.0, 0.0]])
        proj_uv = kp_uv + 2.0
        lvl = jnp.zeros(10, jnp.int32)
        idx, m = matching.search_by_projection(
            proj_uv, lvl, desc, jnp.ones(10, bool),
            kp_uv, lvl, desc, jnp.ones(10, bool),
            radius_per_row=jnp.full(10, 5.0), nn_ratio=None)
        assert bool(jnp.all(m))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
        # shrink window below the offset -> no matches
        idx2, m2 = matching.search_by_projection(
            proj_uv, lvl, desc, jnp.ones(10, bool),
            kp_uv, lvl, desc, jnp.ones(10, bool),
            radius_per_row=jnp.full(10, 1.0), nn_ratio=None)
        assert not bool(jnp.any(m2))


class TestStereo:
    def test_rgbd_virtual_right(self):
        uv = jnp.array([[100.0, 50.0], [200.0, 60.0]])
        depth = jnp.array([2.0, -1.0])
        ur, ok = stereo.rgbd_virtual_right(uv, depth, bf=40.0)
        assert float(ur[0]) == 100.0 - 20.0
        assert float(ur[1]) == -1.0
        assert bool(ok[0]) and not bool(ok[1])

    def test_stereo_match_synthetic_shift(self):
        """Right image = left shifted by a constant disparity."""
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=120, width=160)
        img_l = textured_image(jax.random.PRNGKey(4), 120, 160)
        disparity = 8
        img_r = jnp.roll(img_l, (0, -disparity), axis=(0, 1))
        kl, kr = ex(img_l), ex(img_r)
        sf = ex.scale_factors()
        bf, fx = 40.0, 500.0
        ur, depth, ok = stereo.match_stereo(
            kl.uv, kl.level, kl.desc, kl.valid,
            kr.uv, kr.level, kr.desc, kr.valid,
            img_l, img_r, sf, bf, fx, min_z=bf / 500.0 * 10)
        nok = int(jnp.sum(ok))
        assert nok > 20
        d = np.asarray(kl.uv[:, 0] - ur)[np.asarray(ok)]
        assert abs(np.median(d) - disparity) < 1.0
        z = np.asarray(depth)[np.asarray(ok)]
        assert abs(np.median(z) - bf / disparity) < 0.5


class TestSelectionDeterminism:
    def test_ulp_noise_does_not_flip_selection(self):
        """Keypoint selection ranks on a quarter-intensity-quantized key
        with index tie-breaks (_cell_topk), so tiny input perturbations
        (resize ulp noise between runs) keep the SAME keypoint set —
        the r2 VERDICT traced a 30-65 mm repeat-run ATE band to near-tie
        argmax flips in selection."""
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=120, width=160)
        img = textured_image(jax.random.PRNGKey(3), 120, 160)
        noise = jax.random.uniform(jax.random.PRNGKey(4), img.shape,
                                   minval=-1e-4, maxval=1e-4)
        kp_a = ex(img)
        kp_b = ex(img + noise)
        a = {(int(round(float(y))), int(round(float(x))), int(l))
             for (x, y), l, v in zip(np.asarray(kp_a.uv),
                                     np.asarray(kp_a.level),
                                     np.asarray(kp_a.valid)) if v}
        b = {(int(round(float(y))), int(round(float(x))), int(l))
             for (x, y), l, v in zip(np.asarray(kp_b.uv),
                                     np.asarray(kp_b.level),
                                     np.asarray(kp_b.valid)) if v}
        inter = len(a & b)
        assert inter >= 0.95 * max(len(a), len(b)), (len(a), len(b), inter)

    def test_identical_input_identical_output(self):
        cfg = small_cfg()
        ex = OrbExtractor(cfg, height=120, width=160)
        img = textured_image(jax.random.PRNGKey(5), 120, 160)
        kp_a, kp_b = ex(img), ex(img)
        assert np.array_equal(np.asarray(kp_a.uv), np.asarray(kp_b.uv))
        assert np.array_equal(np.asarray(kp_a.desc), np.asarray(kp_b.desc))
