"""Tests for the EuRoC loader: YAML calibration parsing, rectification
map construction (initUndistortRectifyMap semantics), bilinear remap."""

import os

import numpy as np

from object_slam_tpu.datasets import euroc


CAL_YAML = """%YAML:1.0
Camera.fx: 435.2
Camera.fy: 435.2
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.45, 0, 0, 435.2, 252.2, 0, 0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.45, 0, 0, 435.2, 252.2, 0, 0, 0, 1, 0]
"""


def write_calib(tmp_path):
    p = os.path.join(tmp_path, "EuRoC.yaml")
    with open(p, "w") as f:
        f.write(CAL_YAML)
    return p


class TestCalibParsing:
    def test_parse_blocks(self, tmp_path):
        calib = euroc.EurocCalib.from_yaml(write_calib(str(tmp_path)))
        assert calib.left.width == 752 and calib.left.height == 480
        np.testing.assert_allclose(calib.left.K[0, 0], 458.654)
        np.testing.assert_allclose(calib.left.D[0], -0.28340811)
        np.testing.assert_allclose(calib.left.P[0, 2], 367.45)
        np.testing.assert_allclose(calib.right.K[1, 2], 255.238)


class TestRectifyMaps:
    def test_identity_calibration_identity_maps(self):
        K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        c = euroc.SideCalib(K=K, D=np.zeros(5), R=np.eye(3), P=K.copy(),
                            width=640, height=480)
        mx, my = euroc.rectify_maps(c)
        u, v = np.meshgrid(np.arange(640.0), np.arange(480.0))
        np.testing.assert_allclose(mx, u, atol=1e-4)
        np.testing.assert_allclose(my, v, atol=1e-4)

    def test_distorted_maps_invert_distortion(self):
        """A point distorted by the model must be pulled back to its
        undistorted location by the rectification map."""
        K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375],
                      [0, 0, 1]])
        D = np.array([-0.2834, 0.0739, 0.0002, 0.0, 0.0])
        c = euroc.SideCalib(K=K, D=D, R=np.eye(3), P=K.copy(),
                            width=752, height=480)
        mx, my = euroc.rectify_maps(c)
        # rectified pixel (400, 300): map gives the distorted source pixel
        xn = (400 - K[0, 2]) / K[0, 0]
        yn = (300 - K[1, 2]) / K[1, 1]
        xd, yd = euroc._distort_radtan(xn, yn, D)
        np.testing.assert_allclose(mx[300, 400], K[0, 0] * xd + K[0, 2],
                                   rtol=1e-5)
        np.testing.assert_allclose(my[300, 400], K[1, 1] * yd + K[1, 2],
                                   rtol=1e-5)


class TestRemap:
    def test_identity_remap_preserves(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
        u, v = np.meshgrid(np.arange(64, dtype=np.float32),
                           np.arange(48, dtype=np.float32))
        out = euroc.remap_bilinear(img, u, v)
        np.testing.assert_allclose(out, img, atol=1e-3)

    def test_half_pixel_shift_interpolates(self):
        img = np.zeros((8, 8), np.float32)
        img[:, 4] = 100.0
        u, v = np.meshgrid(np.arange(8, dtype=np.float32) + 0.5,
                           np.arange(8, dtype=np.float32))
        out = euroc.remap_bilinear(img, u, v)
        np.testing.assert_allclose(out[:, 3], 50.0, atol=1e-4)
        np.testing.assert_allclose(out[:, 4], 50.0, atol=1e-4)

    def test_out_of_bounds_zero(self):
        img = np.ones((8, 8), np.float32)
        u = np.full((8, 8), -5.0, np.float32)
        v = np.full((8, 8), 3.0, np.float32)
        out = euroc.remap_bilinear(img, u, v)
        assert (out == 0).all()


class TestSequence:
    def test_times_file_enumeration(self, tmp_path):
        times = tmp_path / "times.txt"
        times.write_text("1403636579763555584\n1403636579813555456\n")
        frames = euroc.load_sequence("/L", "/R", str(times))
        assert len(frames) == 2
        assert frames[0].left_path == "/L/1403636579763555584.png"
        assert abs(frames[0].timestamp - 1403636579.763555584) < 1e-6

    def test_mav_csv_enumeration(self, tmp_path):
        cam0 = tmp_path / "cam0"
        cam0.mkdir()
        (cam0 / "data.csv").write_text(
            "#timestamp [ns],filename\n"
            "1403636579763555584,1403636579763555584.png\n")
        frames = euroc.load_sequence_mav(str(tmp_path))
        assert len(frames) == 1
        assert frames[0].right_path.endswith(
            "cam1/data/1403636579763555584.png")

    def test_groundtruth_csv(self, tmp_path):
        gt = tmp_path / "data.csv"
        gt.write_text("#ts,px,py,pz,qw,qx,qy,qz\n"
                      "1403636579763555584,4.68,-1.78,0.8,0.53,-0.15,"
                      "-0.03,0.83\n")
        ts, pos, quat = euroc.load_groundtruth_csv(str(gt))
        assert ts.shape == (1,) and pos.shape == (1, 3)
        np.testing.assert_allclose(pos[0], [4.68, -1.78, 0.8])
