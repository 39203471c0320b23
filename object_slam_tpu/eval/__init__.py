from object_slam_tpu.eval import ate, trajectory_io  # noqa: F401
