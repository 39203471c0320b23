#!/usr/bin/env python
"""Per-frame tracking health on the synthetic KITTI drive: inliers,
GT translation error, close-point counts, object membership."""
import argparse, json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/synth_kitti")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets import kitti
    from object_slam_tpu.slam.system import SlamSystem
    from PIL import Image

    cfg = SlamConfig.kitti_stereo()
    frames = kitti.load_sequence(args.seq)[args.start:args.start + args.frames]
    gt = kitti.load_groundtruth(os.path.join(args.seq, "gt.txt"))
    sys_ = SlamSystem(cfg, enable_objects=True, async_mapping=True)
    for i, fr in enumerate(frames):
        gl = np.asarray(Image.open(fr.left_path), np.float32)
        gr = np.asarray(Image.open(fr.right_path), np.float32)
        rgb = np.stack([gl] * 3, -1)
        sa = kitti.load_semantics(os.path.join(args.seq, "semantic"),
                                  fr.index, cfg)
        f = sys_.track_stereo(jnp.asarray(gl), jnp.asarray(gr),
                              jnp.asarray(rgb), sa, timestamp=fr.timestamp)
        Twc = np.linalg.inv(np.asarray(f.Tcw))
        gtw = gt[args.start + i]
        err = np.linalg.norm(Twc[:3, 3] - gtw[:3, 3])
        d = np.asarray(f.depth); v = np.asarray(f.valid)
        close = (d > 0) & (d < cfg.camera.th_depth * cfg.camera.baseline)
        nobj = int(np.asarray(f.obj.valid).sum())
        print(f"f={args.start+i:3d} inl={getattr(sys_,'_last_n_inliers',-1):4d} "
              f"err={err:7.3f} kps={int(v.sum()):4d} depth={int((d>0).sum()):4d} "
              f"close={int((close&v).sum()):4d} det={nobj} "
              f"obj3d={np.asarray(f.obj3d)[:3].tolist()} kfs={sys_.n_keyframes}",
              flush=True)

if __name__ == "__main__":
    main()
