"""Tests for the native host runtime (decode + prefetch pipeline)."""

import numpy as np
import pytest

from object_slam_tpu.native import loader as native


needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="liboslam_host.so not built")


def write_pngs(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
    depth = rng.randint(0, 60000, (48, 64)).astype(np.uint16)
    mask = (rng.rand(48, 64) > 0.5).astype(np.uint8) * 255
    p_rgb = str(tmp_path / "rgb.png")
    p_depth = str(tmp_path / "depth.png")
    p_mask = str(tmp_path / "mask.png")
    Image.fromarray(rgb).save(p_rgb)
    Image.fromarray(depth).save(p_depth)
    Image.fromarray(mask).save(p_mask)
    return (p_rgb, rgb), (p_depth, depth), (p_mask, mask)


@needs_native
class TestNativeDecode:
    def test_rgb8_roundtrip(self, tmp_path):
        (p, ref), _, _ = write_pngs(tmp_path)
        out = native.decode_image(p)
        np.testing.assert_array_equal(out, ref)

    def test_gray16_roundtrip(self, tmp_path):
        _, (p, ref), _ = write_pngs(tmp_path)
        out = native.decode_image(p)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, ref)

    def test_mask_roundtrip(self, tmp_path):
        _, _, (p, ref) = write_pngs(tmp_path)
        out = native.decode_image(p)
        np.testing.assert_array_equal(out, ref)


@needs_native
class TestPrefetcher:
    def test_pipeline_in_order(self, tmp_path):
        (p_rgb, rgb), (p_depth, depth), (p_mask, mask) = write_pngs(tmp_path)
        pf = native.FramePrefetcher(n_workers=2, capacity=4)
        for fid in range(6):
            pf.submit(fid, p_rgb, p_depth, [p_mask, p_mask])
        for fid in range(6):
            r, d, ms = pf.get(fid)
            np.testing.assert_array_equal(r, rgb)
            np.testing.assert_array_equal(d, depth)
            assert len(ms) == 2
            np.testing.assert_array_equal(ms[0], mask)
        pf.close()

    def test_out_of_order_get(self, tmp_path):
        (p_rgb, rgb), (p_depth, _), (p_mask, _) = write_pngs(tmp_path)
        pf = native.FramePrefetcher(n_workers=3, capacity=8)
        for fid in range(5):
            pf.submit(fid, p_rgb, p_depth, [])
        for fid in [4, 0, 2, 1, 3]:
            r, d, ms = pf.get(fid)
            np.testing.assert_array_equal(r, rgb)
        pf.close()

    def test_missing_file_errors(self, tmp_path):
        pf = native.FramePrefetcher(n_workers=1, capacity=2)
        pf.submit(0, str(tmp_path / "nope.png"))
        with pytest.raises(IOError):
            pf.get(0)
        pf.close()
