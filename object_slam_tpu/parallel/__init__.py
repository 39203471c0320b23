from object_slam_tpu.parallel import sharded_ba  # noqa: F401
