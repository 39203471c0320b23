from object_slam_tpu.ops import distance_transform  # noqa: F401
