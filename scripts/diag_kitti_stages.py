#!/usr/bin/env python
"""Time each per-frame/per-KF device stage at KITTI capacities (the
battery measured 5.4 s median per KITTI frame with a KF inserted every
frame — find the sink)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.slam.system import SlamSystem
    from PIL import Image

    seq = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_kitti2"
    cfg = SlamConfig.kitti_stereo()
    frames = kitti.load_sequence(seq)[:12]
    sys_ = SlamSystem(cfg, enable_objects=True, async_mapping=False)
    for i, fr in enumerate(frames):
        gl = np.asarray(Image.open(fr.left_path), np.float32)
        gr = np.asarray(Image.open(fr.right_path), np.float32)
        rgb = np.stack([gl] * 3, -1)
        sa = kitti.load_semantics(os.path.join(seq, "semantic"), fr.index, cfg)
        f = sys_.track_stereo(jnp.asarray(gl), jnp.asarray(gr),
                              jnp.asarray(rgb), sa, timestamp=fr.timestamp)
    m = sys_.map
    frame, last = f, sys_.last_frame

    def timeit(name, fn, *args, n=5):
        out = fn(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:20s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)

    timeit("build_stereo", lambda: sys_.builder.build_stereo(
        jnp.asarray(gl), jnp.asarray(gr), jnp.asarray(rgb),
        sys_.builder.pack_sem_arrays(sa), 0.0))
    timeit("fused", sys_._jit_fused, m, frame, last, jnp.eye(4),
           jnp.int32(max(sys_.last_kf_id, 0)), jnp.int32(1), jnp.int32(11),
           jnp.int32(500))
    spawn = frame.valid & (frame.depth > 0)
    timeit("insert", sys_._jit_insert, m, frame, frame.Tcw, frame.kp_pt,
           spawn, np.int32(11))
    timeit("mapping", sys_._jit_mapping, m, jnp.int32(max(sys_.last_kf_id, 0)))
    from object_slam_tpu.slam import local_mapping, map_ops
    from object_slam_tpu.slam.map_state import covisibility, recompute_point_stats
    timeit("covisibility", jax.jit(covisibility), m)
    timeit("recompute_stats", jax.jit(recompute_point_stats), m)
    kfi = jnp.int32(max(sys_.last_kf_id, 0))
    timeit("cull_points", jax.jit(lambda mm, k: map_ops.cull_points(
        mm, k, recency_scope=True)), m, kfi)
    timeit("triangulate", jax.jit(lambda mm, k: map_ops.triangulate_new_points(
        mm, k, n_neighbors=5, K=sys_.K, inv_sigma2_lvl=sys_.inv_sigma2,
        scale_factors=sys_.scale_factors)), m, kfi)
    timeit("fuse", jax.jit(lambda mm, k: map_ops.fuse_into_neighbors(
        mm, k, n_neighbors=5, K=sys_.K, scale_factors=sys_.scale_factors,
        inv_sigma2_lvl=sys_.inv_sigma2)), m, kfi)
    timeit("local_ba", jax.jit(lambda mm, k: local_mapping.run_local_ba(
        K=sys_.K, m=mm, kf_id=k, window=cfg.caps.local_window_kf, n_fixed=8,
        inv_sigma2_lvl=sys_.inv_sigma2)), m, kfi)
    timeit("cull_kfs", jax.jit(lambda mm, k: map_ops.cull_keyframes(
        mm, k, scale_condition=False, n_levels=cfg.orb.n_levels)), m, kfi)

if __name__ == "__main__":
    main()
