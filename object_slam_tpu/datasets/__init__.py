from object_slam_tpu.datasets import synthetic, tum, kitti  # noqa: F401
