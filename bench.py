"""Benchmark: per-frame tracking throughput of the jitted tracking chain.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: tracked frames/s of the core per-frame pipeline (ORB
extraction -> projection matching -> robust GN pose solve) on synthetic
VGA RGB-D frames, single chip. vs_baseline is against the reference's
real-time operating point (30 fps on a desktop i7 per its README claim —
/root/reference/README.md:24; the repo publishes no measured numbers,
BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.geometry import camera as cam_mod, se3
    from object_slam_tpu.slam import tracking as trk
    from object_slam_tpu.slam.frame import FrameBuilder
    from object_slam_tpu.slam.map_state import init_map

    cfg = SlamConfig()  # full TUM geometry: 640x480, 1000 features
    builder = FrameBuilder(cfg)
    K = builder.K
    sf = builder.scale_factors
    inv_s2 = builder.inv_sigma2
    N = cfg.caps.n_kp

    # synthetic world + frames
    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (cfg.camera.height // 4,
                                cfg.camera.width // 4)).astype(np.float32)
    img = np.kron(base, np.ones((4, 4), np.float32))
    depth = rng.uniform(1.0, 5.0, (cfg.camera.height,
                                   cfg.camera.width)).astype(np.float32)
    rgb = np.stack([img] * 3, -1)
    sem = builder.empty_semantics()

    # build one frame to seed the map-point slab
    f0 = builder.build_rgbd(jnp.asarray(img), jnp.asarray(depth),
                            jnp.asarray(rgb), sem, 0.0)
    m = init_map(cfg.caps, cfg.objects.history_capacity)
    pc = cam_mod.backproject(K, f0.uv, jnp.maximum(f0.depth, 1e-6))
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:N].set(pc),
        pt_desc=m.pt_desc.at[:N].set(f0.desc),
        pt_valid=m.pt_valid.at[:N].set(f0.valid & (f0.depth > 0)))
    last_pt = jnp.where(f0.valid & (f0.depth > 0),
                        jnp.arange(N, dtype=jnp.int32), -1)

    @jax.jit
    def track_step(gray, depth_img, m, last_uv, last_pt, last_level,
                   last_valid, T_pred):
        frame = builder._build_rgbd_noobj(gray, depth_img, jnp.float32(0.0))
        res = trk.track_motion_model(
            K, m, frame, last_uv, last_pt, last_level, last_valid,
            T_pred, sf, inv_s2)
        return res.Tcw, res.n_inliers

    gray_j = jnp.asarray(img)
    depth_j = jnp.asarray(depth)
    args = (gray_j, depth_j, m, f0.uv, last_pt, f0.level, f0.valid,
            jnp.eye(4))

    # warmup (compile)
    Tcw, n = track_step(*args)
    Tcw.block_until_ready()

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        Tcw, n = track_step(*args)
    Tcw.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "tracking_fps_synthetic_vga",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
