"""Data-parallel batched tracking: many sequences per chip.

SURVEY.md §2.3 names a "data-parallel batched frame pipeline" as a
first-class TPU component with no reference counterpart: the reference is
one camera / one CPU process; a TPU chip is wildly underutilized by a
single 640x480 stream (the tracking step peaks a few percent of the MXU).
Here the whole per-frame chain — feature extraction excluded (it is
already batched internally) — vmaps over a leading batch axis of
independent sequences, one MapState slab stack + frame stack per element.
This is the serving configuration: B robots/cameras tracked in lockstep
by one chip, throughput scaling near-linearly until VMEM/HBM saturates.

vmap composes with the mesh: sharding the batch axis over devices
(jax.sharding) turns this into multi-chip fleet tracking with zero
algorithm changes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_slam_tpu.slam import tracking as trk
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import MapState


class BatchedTracker:
    """Compiled vmapped motion-model + local-map tracking.

    All batch elements share the camera model and capacities (one compiled
    program); their map contents are independent.
    """

    def __init__(self, K, scale_factors, inv_sigma2, log_scale: float,
                 radius_th: float = 15.0):
        self.K = K

        def one(m, frame, last_uv, last_pt, last_level, last_valid, T_pred):
            tr = trk.track_motion_model(
                K, m, frame, last_uv, last_pt, last_level, last_valid,
                T_pred, scale_factors, inv_sigma2, radius_th=radius_th)
            res, m2, ref_kf = trk.track_local_map(
                K, m, frame, tr, scale_factors, inv_sigma2, log_scale)
            return res, m2

        self._step = jax.jit(jax.vmap(one))

    def step(self, maps: MapState, frames: FrameData,
             last_uv, last_pt, last_level, last_valid, T_pred):
        """All args carry a leading batch axis (stacked pytrees)."""
        return self._step(maps, frames, last_uv, last_pt, last_level,
                          last_valid, T_pred)


def stack_pytrees(trees):
    """Stack a list of identical-structure pytrees along a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
