#!/usr/bin/env python
"""Where does the objects-on full-pipeline frame time go?

bench_full measured 0.42 fps on the remote-attached chip while the
tracking core sustains 191 fps — a ~2.4 s/frame gap that must be host
round trips and/or per-frame transfer volume, not device FLOPs. This
times the per-frame path stage by stage (profiler spans + wall clock
around build/track) and prints the top sinks, plus the per-frame
host->device transfer volume of the semantic masks.

Usage: python scripts/diag_fullpipe.py [--frames 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    orbit_poses)
    from object_slam_tpu.slam.system import SlamSystem

    cfg = SlamConfig.tum_rgbd()
    scene = SyntheticScene.make(cfg, seed=3, n_objects=3)
    for b in scene.boxes:
        b['size'] = 0.9
    poses = orbit_poses(args.frames, step=0.01)

    frames = []
    for T in poses:
        gray, depth, rgb, sem = scene.render_rgbd(T)
        d16 = np.clip(np.asarray(depth) * cfg.camera.depth_map_factor,
                      0, 65535).astype(np.uint16)
        rgb8 = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        sa = scene.sem_arrays(sem, cfg.semantic.max_instances)
        frames.append((d16, rgb8, sa))

    sem_bytes = sum(np.asarray(a).nbytes for a in frames[0][2])
    print(f"sem arrays per frame: {sem_bytes/1e6:.2f} MB "
          f"(+{frames[0][0].nbytes/1e6:.2f} MB depth, "
          f"{frames[0][1].nbytes/1e6:.2f} MB rgb)")

    sys_ = SlamSystem(cfg, enable_objects=True)
    sys_.profiler.enabled = True
    build_t, track_t = [], []
    for i, (d16, rgb8, sa) in enumerate(frames):
        t0 = time.perf_counter()
        f = sys_.builder.build_rgbd(None, jnp.asarray(d16),
                                    jnp.asarray(rgb8), sa, i / 30.0)
        jnp.asarray(f.desc).block_until_ready()
        t1 = time.perf_counter()
        sys_._host_ts = i / 30.0
        out = sys_._track(f)
        jnp.asarray(out.Tcw).block_until_ready()
        t2 = time.perf_counter()
        build_t.append(t1 - t0)
        track_t.append(t2 - t1)
    build_t, track_t = np.asarray(build_t), np.asarray(track_t)
    print(f"build: median {np.median(build_t[4:])*1e3:.1f} ms  "
          f"track: median {np.median(track_t[4:])*1e3:.1f} ms")
    print(sys_.profiler.report())


if __name__ == "__main__":
    main()
