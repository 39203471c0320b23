"""Tests for HSV histograms, distance/feature transforms, Object2D build."""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.ops import distance_transform as dt
from object_slam_tpu.semantic import hsv, object2d


class TestHSV:
    def test_rgb_to_hsv_primary_colors(self):
        rgb = jnp.array([[[255.0, 0.0, 0.0], [0.0, 255.0, 0.0],
                          [0.0, 0.0, 255.0], [255.0, 255.0, 255.0]]])
        out = np.asarray(hsv.rgb_to_hsv_cv(rgb))[0]
        assert abs(out[0][0] - 0.0) < 1e-3          # red H=0
        assert abs(out[1][0] - 60.0) < 1e-3         # green H=120/2
        assert abs(out[2][0] - 120.0) < 1e-3        # blue H=240/2
        assert out[3][1] == 0.0                     # white S=0
        assert out[3][2] == 255.0

    def test_histogram_l1_normalized(self):
        key = jax.random.PRNGKey(0)
        rgb = jax.random.uniform(key, (32, 32, 3)) * 255.0
        mask = jnp.zeros((32, 32), bool).at[4:20, 4:20].set(True)
        h = hsv.masked_hsv_histogram(hsv.rgb_to_hsv_cv(rgb), mask)
        assert h.shape == (94,)
        assert abs(float(jnp.sum(h)) - 1.0) < 1e-5

    def test_cosine_similarity_same_distribution(self):
        key = jax.random.PRNGKey(1)
        rgb = jax.random.uniform(key, (40, 40, 3)) * 255.0
        m1 = jnp.zeros((40, 40), bool).at[0:20, :].set(True)
        m2 = jnp.zeros((40, 40), bool).at[20:40, :].set(True)
        hsv_img = hsv.rgb_to_hsv_cv(rgb)
        h1 = hsv.masked_hsv_histogram(hsv_img, m1)
        h2 = hsv.masked_hsv_histogram(hsv_img, m2)
        # two halves of iid noise: similar distributions
        assert float(hsv.cosine_similarity(h1, h2)) > 0.9
        # vs a constant-color patch: dissimilar
        rgb_c = jnp.ones((40, 40, 3)) * jnp.array([200.0, 30.0, 30.0])
        h3 = hsv.masked_hsv_histogram(hsv.rgb_to_hsv_cv(rgb_c), m1)
        assert float(hsv.cosine_similarity(h1, h3)) < 0.7


class TestDistanceTransform:
    def test_feature_transform_exact(self):
        mask = jnp.zeros((32, 48), bool).at[10, 20].set(True).at[25, 40].set(True)
        ft = dt.feature_transform(mask)
        # at a seed: itself
        np.testing.assert_allclose(np.asarray(ft[10, 20]), [10, 20])
        # elsewhere: nearest of the two seeds
        near, d = dt.nearest_mask_pixel(ft, jnp.array([[21.0, 11.0]]))  # (u,v)
        np.testing.assert_allclose(np.asarray(near[0]), [20, 10])
        # brute-force check on a grid of queries
        ys, xs = np.mgrid[0:32:5, 0:48:7]
        seeds = np.array([[10, 20], [25, 40]])
        for y, x in zip(ys.ravel(), xs.ravel()):
            d_all = np.abs(seeds - [y, x])
            expect = np.min(np.sqrt((d_all ** 2).sum(1)))
            got = np.sqrt(float((ft[y, x][0] - y) ** 2 + (ft[y, x][1] - x) ** 2))
            assert abs(got - expect) < 1e-3, (y, x)

    def test_empty_mask(self):
        mask = jnp.zeros((16, 16), bool)
        ft = dt.feature_transform(mask)
        _, d = dt.nearest_mask_pixel(ft, jnp.array([[5.0, 5.0]]))
        assert not bool(jnp.isfinite(d[0]))

    def test_erode_box(self):
        mask = jnp.zeros((40, 40), bool).at[5:35, 5:35].set(True)
        er = dt.erode(mask, 5)
        e = np.asarray(er)
        assert e[20, 20]
        assert not e[6, 6]       # within margin of the boundary
        assert e[11, 11] or e[12, 12]


class TestObject2D:
    def test_build_assigns_keypoints(self):
        H, W, I, N = 64, 80, 4, 32
        rgb = jnp.ones((H, W, 3)) * 128.0
        masks = jnp.zeros((I, H, W), bool).at[0, 10:50, 10:60].set(True)
        labels = jnp.array([56, -1, -1, -1], jnp.int32)
        probs = jnp.array([0.9, 0, 0, 0])
        bboxes = jnp.array([[10, 10, 50, 40]] + [[0, 0, 0, 0]] * 3, jnp.float32)
        ivalid = jnp.array([True, False, False, False])
        # keypoints: 10 inside the eroded mask, rest outside
        kp_uv = jnp.concatenate([
            jnp.stack([jnp.linspace(25, 40, 10), jnp.linspace(25, 35, 10)], -1),
            jnp.stack([jnp.full(22, 70.0), jnp.linspace(2, 60, 22)], -1)])
        kp_depth = jnp.full((N,), 2.0)
        kp_valid = jnp.ones((N,), bool)
        slab = object2d.build_object2ds(
            rgb, masks, labels, probs, bboxes, ivalid,
            kp_uv, kp_depth, kp_valid, th_depth=5.0, min_kps=5, mask_margin=5)
        assert bool(slab.valid[0])
        assert int(slab.n_kps[0]) == 10
        inside = np.asarray(slab.kp2obj[:10])
        np.testing.assert_array_equal(inside, 0)
        assert (np.asarray(slab.kp2obj[10:]) == -1).all()

    def test_min_kps_gate(self):
        H, W, I, N = 64, 80, 2, 8
        rgb = jnp.zeros((H, W, 3))
        masks = jnp.zeros((I, H, W), bool).at[0, 20:40, 20:40].set(True)
        labels = jnp.array([56, -1], jnp.int32)
        kp_uv = jnp.stack([jnp.full(N, 30.0), jnp.full(N, 30.0)], -1)
        kp_depth = jnp.full((N,), -1.0)   # no depth -> no members
        slab = object2d.build_object2ds(
            rgb, masks, labels, jnp.ones(I), jnp.zeros((I, 4)),
            jnp.array([True, False]), kp_uv, kp_depth,
            jnp.ones(N, bool), th_depth=5.0, min_kps=5, mask_margin=3)
        assert not bool(slab.valid[0])

    def test_bbox_iou(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 10.0, 10.0],
                       [20.0, 20.0, 5.0, 5.0]])
        iou = np.asarray(object2d.bbox_iou_2d(a, b))[0]
        assert abs(iou[0] - 1.0) < 1e-6
        assert abs(iou[1] - 50.0 / 150.0) < 1e-6
        assert iou[2] == 0.0


class TestMaskPacking:
    def test_roundtrip_vga_and_odd_width(self):
        """Host->device mask transfer is bit-packed 8x (pack_mask_bits /
        unpack_mask_bits, semantic/object2d.py) — the [16, 480, 640] bool
        slab was the largest per-frame payload (VERDICT r2 item 1)."""
        import numpy as np
        import jax.numpy as jnp
        from object_slam_tpu.semantic.object2d import (pack_mask_bits,
                                                       unpack_mask_bits)
        rng = np.random.RandomState(0)
        for w in (640, 1241, 157):
            m = rng.rand(3, 32, w) > 0.5
            p = pack_mask_bits(m)
            assert p.dtype == np.uint8 and p.shape == (3, 32, (w + 7) // 8)
            u = np.asarray(unpack_mask_bits(jnp.asarray(p), w))
            assert np.array_equal(u, m)

    def test_builder_accepts_bool_and_packed(self):
        """FrameBuilder packs bool masks itself; pre-packed arrays pass
        through (pack_sem_arrays is idempotent)."""
        import numpy as np
        from object_slam_tpu.config import SlamConfig, CameraConfig
        from object_slam_tpu.slam.frame import FrameBuilder
        cfg = SlamConfig(camera=CameraConfig(
            width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0,
            dist=(0, 0, 0, 0, 0), bf=13.0, depth_map_factor=1.0))
        b = FrameBuilder(cfg)
        masks = np.zeros((2, 120, 160), bool)
        masks[0, 40:80, 40:80] = True
        sa = (masks, np.array([56, -1], np.int32),
              np.array([0.9, 0.0], np.float32),
              np.array([[40, 40, 40, 40], [0, 0, 0, 0]], np.float32),
              np.array([True, False]))
        packed = b.pack_sem_arrays(sa)
        assert packed[0].dtype == np.uint8
        repacked = b.pack_sem_arrays(packed)
        assert repacked[0] is packed[0]


class TestFrameBlob:
    def test_blob_build_matches_standard_build(self):
        """The single-transfer blob path must produce the same FrameData
        as the multi-array path (bitcast layout roundtrip)."""
        import numpy as np
        from object_slam_tpu.config import (SlamConfig, OrbConfig,
                                            CapacityConfig, CameraConfig)
        from object_slam_tpu.datasets.synthetic import SyntheticScene
        from object_slam_tpu.slam.frame import FrameBuilder
        cfg = SlamConfig(
            camera=CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                                cx=80.0, cy=60.0, dist=(0, 0, 0, 0, 0),
                                bf=13.0, th_depth=40.0,
                                depth_map_factor=1000.0),
            orb=OrbConfig(n_features=300, n_levels=4),
            caps=CapacityConfig(n_kp=384, max_points=8192, max_keyframes=64))
        scene = SyntheticScene.make(cfg, seed=5, n_objects=2, plane_z=3.0)
        for b in scene.boxes:
            b['size'] = 1.0
            b['center'][2] = 2.0
        gray, depth, rgb, sem = scene.render_rgbd(np.eye(4, dtype=np.float32))
        d16 = np.clip(np.asarray(depth) * cfg.camera.depth_map_factor,
                      0, 65535).astype(np.uint16)
        rgb8 = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        sa = scene.sem_arrays(sem, cfg.semantic.max_instances)
        b_ = FrameBuilder(cfg)

        f_std = b_.build_rgbd(None, jnp.asarray(d16), jnp.asarray(rgb8),
                              sa, 0.0)
        blob, inst_valid = b_.pack_frame_blob(d16, rgb8, sa)
        f_blob = b_.build_rgbd_blob(blob, inst_valid, 0.0)
        np.testing.assert_array_equal(np.asarray(f_std.uv),
                                      np.asarray(f_blob.uv))
        np.testing.assert_array_equal(np.asarray(f_std.desc),
                                      np.asarray(f_blob.desc))
        np.testing.assert_allclose(np.asarray(f_std.depth),
                                   np.asarray(f_blob.depth), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(f_std.obj.label),
                                      np.asarray(f_blob.obj.label))
        np.testing.assert_array_equal(np.asarray(f_std.obj.valid),
                                      np.asarray(f_blob.obj.valid))
        # no-detection path too
        blob2, iv2 = b_.pack_frame_blob(d16, rgb8, None)
        f2 = b_.build_rgbd_blob(blob2, iv2, 0.0)
        np.testing.assert_array_equal(np.asarray(f_std.uv),
                                      np.asarray(f2.uv))
