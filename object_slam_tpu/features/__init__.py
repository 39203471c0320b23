from object_slam_tpu.features import pyramid, fast, extractor, matching, stereo  # noqa: F401
