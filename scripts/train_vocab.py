#!/usr/bin/env python
"""Train an ORB vocabulary from scratch on synthetic-scene descriptors.

The reference loads OpenCV/DBoW2's pre-trained ORBvoc.txt (System.cc:69).
We train our own hierarchical k-medians tree (loop/vocabulary.py) on a
descriptor corpus harvested from many rendered viewpoints of many room
scenes — the same construction (Galvez-Lopez & Tardos 2012), our data.
Output: object_slam_tpu/loop/vocab_synth.txt (DBoW2 text format, loadable
by Vocabulary.load_dbow2_text).

Usage: JAX_PLATFORMS=cpu python scripts/train_vocab.py [--depth 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def harvest(n_scenes=10, n_poses=8):
    import jax.numpy as jnp
    from object_slam_tpu.config import SlamConfig
    from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                    loop_trajectory)
    from object_slam_tpu.features.extractor import OrbExtractor

    cfg = SlamConfig.tum_rgbd()
    ex = OrbExtractor(cfg)
    descs = []
    for seed in range(n_scenes):
        scene = SyntheticScene.make(cfg, seed=seed, n_objects=2,
                                    plane_z=3.2 + 0.3 * seed)
        for T in loop_trajectory(n_poses):
            gray, _, _, _ = scene.render_rgbd(T)
            kp = ex(jnp.asarray(gray))
            v = np.asarray(kp.valid)
            descs.append(np.asarray(kp.desc)[v])
        print(f"scene {seed}: corpus {sum(d.shape[0] for d in descs)}",
              flush=True)
    return np.concatenate(descs, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--branching", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=10)
    args = ap.parse_args()

    from object_slam_tpu.loop.vocabulary import Vocabulary

    descs = harvest(n_scenes=args.scenes)
    print(f"training k={args.branching} L={args.depth} on {descs.shape[0]}")
    voc = Vocabulary.train(descs, args.branching, args.depth, seed=0)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "object_slam_tpu", "loop", "vocab_synth.txt")
    voc.save_dbow2_text(out)
    print(f"saved {out} ({voc.n_words} words)")


if __name__ == "__main__":
    main()
