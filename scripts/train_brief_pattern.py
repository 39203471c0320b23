#!/usr/bin/env python
"""Learn a decorrelated BRIEF test pattern (the rBRIEF construction).

The reference uses OpenCV's learned 256-pair table
(`ORBextractor.cc:448-450` bit_pattern_31_). Round 1 shipped a seeded
random Gaussian pattern; its bits are correlated and its means sit far
from 0.5, which costs inter-descriptor separation and was diagnosed as a
driver of long-sequence match-retention loss (BENCHMARKS.md).

This script re-runs the ORB paper's learning procedure from scratch
(Rublee et al., ICCV 2011, §4.3 — PAPERS.md):
  1. Harvest a corpus of ~50k oriented keypoint patches from synthetic
     scenes (multiple textures, depths, viewpoints, pyramid levels),
     steered to canonical orientation with the same IC-angle estimator
     the runtime uses.
  2. Enumerate candidate binary tests = pairs of positions inside the
     patch disk, computed on the blurred patch (the runtime samples
     blurred patches, so single-pixel tests ARE smoothed-window tests).
  3. Greedy selection: order tests by |mean-0.5| distance, then accept a
     test only if its absolute correlation with every already-chosen test
     stays below a threshold; relax the threshold until 256 tests fill.

Output: object_slam_tpu/features/brief_pattern.npy  [256, 4] float32
        rows (y1, x1, y2, x2) — the format make_brief_matrix consumes.

Usage: JAX_PLATFORMS=cpu python scripts/train_brief_pattern.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# sitecustomize pins jax_platforms=axon; the env var alone is not enough
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


PATCH = 32
HALF = 15
RADIUS = 13          # tests stay inside the steering disk
GRID_STEP = 1        # candidate position granularity


def harvest_patches(n_target=50000):
    """Oriented, blurred keypoint patches from synthetic renders."""
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import SyntheticScene, orbit_poses
    from object_slam_tpu.features.extractor import OrbExtractor, HALF as XHALF
    from object_slam_tpu.features import pyramid as pyr_mod
    from object_slam_tpu.ops.patch_pallas import extract_patches_auto

    cfg = SlamConfig.tum_rgbd()
    ex = OrbExtractor(cfg)
    patches = []
    rng = np.random.RandomState(0)
    for seed in range(6):
        scene = SyntheticScene.make(cfg, seed=seed, n_objects=2,
                                    plane_z=3.0 + 0.6 * seed)
        poses = orbit_poses(8, radius=0.5, step=0.05)
        for T in poses:
            gray, _, _, _ = scene.render_rgbd(T)
            img = jnp.asarray(gray)
            kp = ex(img)
            valid = np.asarray(kp.valid)
            uv = np.asarray(kp.uv)
            lvl = np.asarray(kp.level)
            ang = np.asarray(kp.angle)
            # gather blurred patches per level, then rotate to canonical
            o = cfg.orb
            levels = pyr_mod.build_pyramid(img, o.n_levels, o.scale_factor)
            for l in range(o.n_levels):
                sel = valid & (lvl == l)
                if sel.sum() == 0:
                    continue
                scale = o.scale_factor ** l
                xs = np.round(uv[sel, 0] / scale).astype(np.int32)
                ys = np.round(uv[sel, 1] / scale).astype(np.int32)
                blurred = pyr_mod.gaussian_blur(levels[l])
                p = np.asarray(extract_patches_auto(
                    blurred, jnp.asarray(ys - XHALF), jnp.asarray(xs - XHALF),
                    PATCH))
                a = ang[sel]
                patches.append(rotate_patches(p, -a))
            if sum(x.shape[0] for x in patches) >= n_target:
                break
        if sum(x.shape[0] for x in patches) >= n_target:
            break
    out = np.concatenate(patches, 0)[:n_target]
    print(f"corpus: {out.shape[0]} patches")
    return out


def rotate_patches(p, angles):
    """Bilinear rotation of [N, PATCH, PATCH] patches about (HALF, HALF)."""
    n = p.shape[0]
    d = np.arange(PATCH, dtype=np.float32) - HALF
    gy, gx = np.meshgrid(d, d, indexing="ij")
    c = np.cos(angles)[:, None, None]
    s = np.sin(angles)[:, None, None]
    sy = c * gy[None] - s * gx[None] + HALF
    sx = s * gy[None] + c * gx[None] + HALF
    y0 = np.clip(np.floor(sy).astype(np.int32), 0, PATCH - 2)
    x0 = np.clip(np.floor(sx).astype(np.int32), 0, PATCH - 2)
    fy = np.clip(sy - y0, 0.0, 1.0)
    fx = np.clip(sx - x0, 0.0, 1.0)
    ii = np.arange(n)[:, None, None]
    return (p[ii, y0, x0] * (1 - fy) * (1 - fx)
            + p[ii, y0, x0 + 1] * (1 - fy) * fx
            + p[ii, y0 + 1, x0] * fy * (1 - fx)
            + p[ii, y0 + 1, x0 + 1] * fy * fx)


def candidate_positions():
    d = np.arange(-RADIUS, RADIUS + 1, GRID_STEP)
    gy, gx = np.meshgrid(d, d, indexing="ij")
    keep = gy * gy + gx * gx <= RADIUS * RADIUS
    return np.stack([gy[keep], gx[keep]], -1)     # [M, 2]


def main():
    patches = harvest_patches()
    n = patches.shape[0]
    pos = candidate_positions()
    M = pos.shape[0]
    print(f"{M} positions -> {M * (M - 1) // 2} possible tests")

    # subsample candidate pairs (the full set is redundant at step=1)
    rng = np.random.RandomState(1)
    n_cand = 80000
    ia = rng.randint(0, M, n_cand * 2)
    ib = rng.randint(0, M, n_cand * 2)
    keep = ia != ib
    ia, ib = ia[keep][:n_cand], ib[keep][:n_cand]
    # canonicalize + dedup
    pairs = np.stack([np.minimum(ia, ib), np.maximum(ia, ib)], -1)
    pairs = np.unique(pairs, axis=0)
    ia, ib = pairs[:, 0], pairs[:, 1]
    T = ia.shape[0]
    print(f"{T} candidate tests")

    # bit matrix over the corpus, computed in blocks
    flat = patches.reshape(n, -1)
    pa = (pos[ia][:, 0] + HALF) * PATCH + (pos[ia][:, 1] + HALF)
    pb = (pos[ib][:, 0] + HALF) * PATCH + (pos[ib][:, 1] + HALF)
    bits = np.empty((T, n), np.float32)
    B = 8192
    for s in range(0, T, B):
        e = min(s + B, T)
        bits[s:e] = (flat[:, pa[s:e]] < flat[:, pb[s:e]]).T
    mean = bits.mean(axis=1)
    bits_c = bits - mean[:, None]                 # centered, for correlation
    norm = np.sqrt((bits_c * bits_c).sum(axis=1)) + 1e-9

    order = np.argsort(np.abs(mean - 0.5))
    chosen = []
    max_corr = np.zeros(T, np.float32)
    alive = np.ones(T, bool)
    thresh = 0.2
    while len(chosen) < 256:
        progressed = False
        for t in order:
            if not alive[t] or max_corr[t] >= thresh:
                continue
            # exact check vs all chosen (max_corr only tracks a lower bound
            # between threshold bumps)
            ok = True
            for c in chosen[::-1]:
                r = abs(np.dot(bits_c[t], bits_c[c]) / (norm[t] * norm[c]))
                max_corr[t] = max(max_corr[t], r)
                if r >= thresh:
                    ok = False
                    break
            if not ok:
                continue
            chosen.append(t)
            alive[t] = False
            # update bound vs the new member for everyone (vectorized)
            r_all = np.abs(bits_c @ bits_c[t] / (norm * norm[t]))
            max_corr = np.maximum(max_corr, r_all)
            max_corr[t] = 0
            progressed = True
            if len(chosen) >= 256:
                break
        if len(chosen) < 256:
            thresh += 0.05
            print(f"relaxing correlation threshold -> {thresh:.2f} "
                  f"({len(chosen)} chosen)")
            if not progressed and thresh > 1.0:
                raise RuntimeError("could not fill 256 tests")

    sel = np.asarray(chosen)
    pat = np.concatenate([pos[ia[sel]], pos[ib[sel]]], -1).astype(np.float32)
    # report quality vs the round-1 random pattern
    mm = np.abs(mean[sel] - 0.5)
    cc = np.abs(np.corrcoef(bits[sel]))
    np.fill_diagonal(cc, 0)
    print(f"learned: |mean-0.5| avg {mm.mean():.3f}, "
          f"corr avg {cc.mean():.3f} / p95 {np.percentile(cc, 95):.3f}")

    out = os.path.join(os.path.dirname(__file__), "..",
                       "object_slam_tpu", "features", "brief_pattern.npy")
    np.save(out, pat)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
