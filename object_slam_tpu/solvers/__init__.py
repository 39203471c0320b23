from object_slam_tpu.solvers import pose_opt, ba, pose_graph, ransac, epnp, sim3_solver  # noqa: F401
