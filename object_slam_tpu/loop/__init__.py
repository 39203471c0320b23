from object_slam_tpu.loop import vocabulary, kfdb, loop_closing  # noqa: F401
