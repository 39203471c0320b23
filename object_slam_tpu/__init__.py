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

import os as _os

import jax as _jax

# f32 matmuls/einsums on the TPU MXU default to ONE bf16 pass (inputs
# rounded to 8 significand bits). Every geometry transform here is an f32
# matmul (se3.apply `p @ R.T`, pose composition, the BA/pose-opt einsum
# chains), and at outdoor-trajectory coordinates the input rounding alone
# is ~0.2% — ~0.3 m on a point 150 m down the KITTI corridor, i.e. multi-
# pixel reprojection noise that read as tracking drift and BA jitter
# (measured: the street-canyon drive collapsed on TPU at f~105 while the
# bit-identical frame pipeline tracked 300/300 on CPU; BENCHMARKS.md
# "Stereo / KITTI"). Force full-f32 matmul precision process-wide; the
# throughput-critical matmuls (BRIEF projection, covisibility, HSV
# histograms) pass EXPLICIT bf16 inputs that are exact by construction
# ({0,1}/int-valued), so this costs only the small geometry products.
#
# Defer to the embedding application: if the standard env var or a prior
# jax.config call already chose a precision, leave it alone.
# OSLAM_MATMUL_PRECISION remains the explicit escape hatch either way.
if "OSLAM_MATMUL_PRECISION" in _os.environ:
    _jax.config.update("jax_default_matmul_precision",
                       _os.environ["OSLAM_MATMUL_PRECISION"])
elif (_jax.config.jax_default_matmul_precision is None
      and "JAX_DEFAULT_MATMUL_PRECISION" not in _os.environ):
    _jax.config.update("jax_default_matmul_precision", "highest")

from object_slam_tpu.config import SlamConfig  # noqa: F401
