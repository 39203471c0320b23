from object_slam_tpu.semantic import hsv, object2d, loader  # noqa: F401
