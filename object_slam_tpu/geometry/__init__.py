from object_slam_tpu.geometry import se3, sim3, camera, triangulation, horn  # noqa: F401
