"""object_slam_tpu — a TPU-native object-aware semantic SLAM engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
system yangliu9527/Object_SLAM (an ORB-SLAM2 fork with object-level data
association and semantically constrained pose optimization; see
/root/reference and SURVEY.md). This is NOT a port: the design is
array-oriented (struct-of-arrays map slabs, masked dense compute, batched
RANSAC, Schur-complement BA over device meshes) instead of the reference's
pointer-graph + pthread + mutex architecture.

Layers (mirrors SURVEY.md §1 capabilities, TPU-first shapes):
  geometry/   SE3/Sim3 Lie ops, camera models, triangulation, Horn alignment
  solvers/    GN/LM pose optimization, Schur BA, pose-graph, EPnP, RANSAC
  features/   ORB pipeline: pyramid, FAST, orientation, BRIEF, matching, stereo
  ops/        Pallas TPU kernels for the hot inner loops
  semantic/   YOLACT mask ingestion, Object2D construction, HSV histograms
  slam/       frame pipeline, map state, tracking, local mapping, objects
  loop/       BoW vocabulary, keyframe database, loop closing, relocalization
  parallel/   device meshes, sharded (multi-chip) bundle adjustment
  datasets/   TUM RGB-D / KITTI stereo loaders + synthetic scene generator
  eval/       ATE/RPE evaluation, trajectory writers (TUM/KITTI formats)
"""

__version__ = "0.1.0"

from object_slam_tpu.config import SlamConfig  # noqa: F401
