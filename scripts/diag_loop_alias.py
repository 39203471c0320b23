#!/usr/bin/env python
"""Perceptually-aliased corridor — the loop gate's NEGATIVE test circuit.

Round 4's record contained zero rejected candidates: the pre-gate/budget
path had never fired outside unit tests (VERDICT r4 weak 3). This scene
makes false candidates on purpose: a straight corridor whose wall/floor
textures and furniture repeat with period P (texture sampling in
datasets/synthetic.py is periodic by construction — round 2 met this as
a BUG; here it is the point). Frames one period apart are near
pixel-identical, so BoW detection + Sim3 RANSAC produce a confident
false closure claiming "you are where you were a period ago" — a
correction of ~P that the drift budget must veto.

Expected event mix (loop_closing._correct_loop):
  - early candidates (few keyframes in the graph): the scaled budget is
    large relative to the predicted bend -> the full SPECULATIVE
    correction runs and the post-gates (bend budget / reprojection
    quality) must reject;
  - late candidates (n_edges >> 12x chain length): the cheap PRE-gate
    fires and skips propagate+fuse+pose-graph+GBA entirely.
The per-event wall_ms field validates the pre-gate's cost claim
(rejected < 10% of a full attempt).

Also runs the POSITIVE 120-frame circuit (the diag_loop scene) in the
same process so the record carries an accepted closure's wall cost for
the ratio. Output: one JSON for results/.

Usage: python scripts/diag_loop_alias.py [--frames 240] [--out f.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def build_alias_scene(cfg, period=3.2, n_periods=16, seed=7):
    """Corridor along +z: side walls / floor / ceiling textured with
    tiles whose world-space period divides `period` (uv_scale=80,
    256 texels -> 3.2 units), furniture repeated every period."""
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    _smooth_texture)

    rng = np.random.RandomState(seed)
    length = period * n_periods
    tex_side = _smooth_texture(rng, 256)
    tex_floor = _smooth_texture(rng, 256)
    tex_ceil = _smooth_texture(rng, 256)
    tex_end = _smooth_texture(rng, 1024)
    surfaces = [
        dict(axis=0, offset=-2.2, tex=tex_side, uax=2, vax=1),
        dict(axis=0, offset=2.2, tex=tex_side, uax=2, vax=1),
        dict(axis=1, offset=1.0, tex=tex_floor, uax=0, vax=2),
        dict(axis=1, offset=-1.4, tex=tex_ceil, uax=0, vax=2),
        dict(axis=2, offset=length + 4.0, tex=tex_end, uax=0, vax=1),
        dict(axis=2, offset=-4.0, tex=tex_end, uax=0, vax=1),
    ]
    base_cell = []
    for _ in range(4):
        size = rng.uniform(0.3, 0.6)
        base_cell.append(dict(
            center=np.array([rng.uniform(-1.8, -0.9) if rng.rand() < 0.5
                             else rng.uniform(0.9, 1.8),
                             1.0 - size / 2,
                             rng.uniform(0.2, period - 0.2)]),
            size=size, tex=_smooth_texture(rng, 64)))
    structures = []
    for k in range(n_periods):
        for b in base_cell:
            structures.append(dict(
                center=b["center"] + np.array([0.0, 0.0, k * period]),
                size=b["size"], tex=b["tex"]))

    cam = cfg.camera
    h, w = cam.height, cam.width
    ys, xs = np.mgrid[0:h, 0:w]
    rays = np.stack([(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy,
                     np.ones_like(xs, np.float64)], -1)
    return SyntheticScene(
        h=h, w=w, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        bf=cam.bf, rng=rng, tex=tex_end, plane_z=length + 4.0,
        boxes=[], rays=rays, surfaces=surfaces, structures=structures,
        bounds_lo=np.array([-2.2, -1.4, -4.0], np.float32),
        bounds_hi=np.array([2.2, 1.0, length + 4.0], np.float32))


def straight_path(n, step=0.2, bob=0.15):
    """Camera-to-world poses walking +z with a slight lateral sinusoid
    (pure straight motion leaves x parallax-starved)."""
    Ts = []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = [bob * np.sin(i * 0.15), 0.0, i * step]
        Ts.append(T)
    return Ts


def run_alias(args):
    import jax
    from scripts.ab_deviations import build_cfg
    from object_slam_tpu.slam.system import SlamSystem

    cfg = build_cfg(args.scale)
    scene = build_alias_scene(cfg, period=args.period,
                              n_periods=args.periods, seed=args.seed)
    poses = straight_path(args.frames, step=args.step)
    sys_ = SlamSystem(cfg, enable_objects=False, enable_loop=True)
    lc = sys_.loop_closer
    for i, Twc in enumerate(poses):
        Tcw = np.linalg.inv(Twc)
        gray, depth, rgb, sem = scene.render_rgbd(Tcw)
        sys_.track_rgbd(gray, depth, rgb,
                        scene.sem_arrays(sem, cfg.semantic.max_instances),
                        timestamp=i / 30.0)
    sys_.flush_mapping()
    errs = []
    for rec, Twc in zip(sys_.trajectory, poses):
        if rec.tracked:
            C = -np.asarray(rec.Tcw)[:3, :3].T @ np.asarray(rec.Tcw)[:3, 3]
            errs.append(np.linalg.norm(C - Twc[:3, 3]))
    return dict(
        frames=args.frames,
        tracked=sum(1 for r in sys_.trajectory if r.tracked),
        keyframes=sys_.n_keyframes,
        ate_rmse_mm=float(np.sqrt(np.mean(np.square(errs))) * 1e3)
        if errs else -1.0,
        loops_closed=lc.n_loops_closed,
        loops_rejected=lc.n_loops_rejected,
        events=lc.events)


def run_positive(args):
    """The accepted-closure control: the r4 positive circuit."""
    import jax
    from scripts.ab_deviations import build_cfg
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    loop_trajectory)
    from object_slam_tpu.slam.system import SlamSystem

    cfg = build_cfg(args.scale)
    scene = SyntheticScene.make(cfg, seed=3, n_objects=3, plane_z=4.0)
    for b in scene.boxes:
        b["size"] = 0.9
    poses = loop_trajectory(120, sweep=2 * np.pi * 1.15)
    sys_ = SlamSystem(cfg, enable_objects=False, enable_loop=True)
    lc = sys_.loop_closer
    for i, T in enumerate(poses):
        gray, depth, rgb, sem = scene.render_rgbd(T)
        sys_.track_rgbd(gray, depth, rgb,
                        scene.sem_arrays(sem, cfg.semantic.max_instances),
                        timestamp=i / 30.0)
    sys_.flush_mapping()
    return dict(loops_closed=lc.n_loops_closed,
                loops_rejected=lc.n_loops_rejected,
                events=lc.events)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--periods", type=int, default=16)
    ap.add_argument("--period", type=float, default=3.2)
    ap.add_argument("--step", type=float, default=0.2)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", default=None, choices=["cpu", "axon"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # positive circuit FIRST and TWICE: the first pass compiles the whole
    # correction path (propagate / fuse / pose graph / GBA / quality);
    # the second provides a compile-clean accepted-closure wall cost for
    # the ratio (the first accepted event's wall_ms is ~228 s of
    # first-hit compiles)
    run_positive(args)
    pos = run_positive(args)
    print("positive circuit (warm):", json.dumps(
        {k: v for k, v in pos.items() if k != "events"}), flush=True)
    for e in pos["events"]:
        print("  event:", json.dumps(e), flush=True)

    alias = run_alias(args)
    print("alias corridor:", json.dumps(
        {k: v for k, v in alias.items() if k != "events"}), flush=True)
    for e in alias["events"]:
        print("  event:", json.dumps(e), flush=True)

    acc = [e for e in pos["events"] if e.get("accepted")]
    pre = [e for e in alias["events"] if e.get("pre_gated")]
    post = [e for e in alias["events"]
            if not e.get("accepted") and not e.get("pre_gated")]
    out = dict(alias=alias, positive=pos)
    if acc and pre:
        out["cost_ratio_pregated_vs_accepted"] = round(
            np.mean([e["wall_ms"] for e in pre])
            / np.mean([e["wall_ms"] for e in acc]), 3)
    if acc and post:
        out["cost_ratio_postgated_vs_accepted"] = round(
            np.mean([e["wall_ms"] for e in post])
            / np.mean([e["wall_ms"] for e in acc]), 3)
    print(json.dumps({k: v for k, v in out.items()
                      if k.startswith("cost_ratio")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
