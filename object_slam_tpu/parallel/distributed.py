"""Multi-host wiring: one flag from single-process to a pod slice.

The reference is strictly single-process (SURVEY.md §2.3); this is the
TPU-native scale-out layer. On a real multi-host slice, call
`maybe_initialize_distributed()` once at process start (each host runs
the same driver); it wires `jax.distributed` so `jax.devices()` spans the
slice and the observation-sharded BA mesh (parallel/sharded_ba.py) rides
ICI within a slice and DCN across slices — XLA inserts the collectives,
nothing else in the code changes.

Unexercisable in this environment (single chip): the call is guarded and
becomes a no-op when no coordinator is configured, so the same driver
binary runs anywhere.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(coordinator: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Initialize jax.distributed when a multi-process launch is
    configured; return True iff distributed mode is active.

    Configuration precedence: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU pod auto-detection
    (jax.distributed.initialize() with no args works on Cloud TPU pods).
    Call BEFORE any other jax API touches the backend.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if os.environ.get("JAX_AUTO_DISTRIBUTED"):
        # Cloud TPU pod: all parameters discoverable from the metadata
        # server; a bare initialize() is the supported form.
        jax.distributed.initialize()
        return True
    return False


def global_mesh(axis_name: str = "ba"):
    """A 1-D mesh over every addressable device across all processes."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()).reshape(-1), (axis_name,))
