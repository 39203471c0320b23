#!/usr/bin/env python
"""Capture an op-level device profile of one pipeline stage (fused
tracking / mapping / frame build) on the live KITTI or TUM state, and
print the top XLA ops — the tool that found the serialized-gather loops
(see solvers/ba.py block_n).

Usage:
  python scripts/diag_trace_stage.py --stage fused --seq /tmp/synth_kitti4
  python scripts/diag_trace_stage.py --stage mapping --seq /tmp/synth_kitti4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/synth_kitti4")
    ap.add_argument("--stage", default="fused",
                    choices=["fused", "mapping", "build"])
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_stage")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.slam.system import SlamSystem
    from PIL import Image

    cfg = SlamConfig.kitti_stereo()
    frames = kitti.load_sequence(args.seq)[:args.frames]
    sys_ = SlamSystem(cfg, enable_objects=True, async_mapping=False)
    for fr in frames:
        gl = np.asarray(Image.open(fr.left_path), np.float32)
        gr = np.asarray(Image.open(fr.right_path), np.float32)
        rgb = np.stack([gl] * 3, -1)
        sa = kitti.load_semantics(os.path.join(args.seq, "semantic"),
                                  fr.index, cfg)
        f = sys_.track_stereo(jnp.asarray(gl), jnp.asarray(gr),
                              jnp.asarray(rgb), sa, timestamp=fr.timestamp)
    sys_.flush_mapping()
    m, frame, last = sys_.map, f, sys_.last_frame

    if args.stage == "fused":
        fn = lambda: sys_._jit_fused(
            m, frame, last, jnp.eye(4),
            jnp.int32(max(sys_.last_kf_id, 0)), jnp.int32(1), jnp.int32(11),
            jnp.int32(500))
    elif args.stage == "mapping":
        fn = lambda: sys_._jit_mapping(m, jnp.int32(max(sys_.last_kf_id, 0)))
    else:
        sem = sys_.builder.pack_sem_arrays(sa)
        fn = lambda: sys_.builder.build_stereo(
            jnp.asarray(gl), jnp.asarray(gr), jnp.asarray(rgb), sem, 0.0)

    out = fn()
    jax.block_until_ready(out)
    with jax.profiler.trace(args.trace_dir):
        out = fn()
        jax.block_until_ready(out)
    from prof_ops import top_ops
    for t, c, name in top_ops(args.trace_dir, args.top):
        print(f"{t:9.2f}ms x{c:7d}  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
