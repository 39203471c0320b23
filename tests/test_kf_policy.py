"""Unit tests for the keyframe-policy min-gap gate and creation-id record.

The r5 KITTI work hangs off two small mechanisms: kf_decision's min_gap
(suppresses dispatch-lag duplicate keyframes — close-budget/decay
triggers only; collapse and max-gap stay live) and kf_frame_id (the
KeyFrame::mnFrameId analogue that creation-order tooling keys on).
"""

import numpy as np
import jax.numpy as jnp

from object_slam_tpu.slam.tracking import kf_decision, need_new_keyframe


class TestKfMinGap:
    def test_close_budget_suppressed_inside_gap(self):
        # close budget would fire (trk<100, untrk>70) but since < min_gap
        kw = dict(n_inliers=400, n_ref_matches=400, n_close_tracked=50,
                  n_close_untracked=500, max_frames=10)
        assert need_new_keyframe(frames_since_kf=0, min_gap=2, **kw) is False
        assert need_new_keyframe(frames_since_kf=1, min_gap=2, **kw) is False
        assert need_new_keyframe(frames_since_kf=2, min_gap=2, **kw) is True
        # min_gap=0 is reference parity: fires immediately
        assert need_new_keyframe(frames_since_kf=0, min_gap=0, **kw) is True

    def test_collapse_trigger_ignores_gap(self):
        # inl < 0.25 * ref is the emergency path (Tracking.cc:1296) —
        # never gated
        assert need_new_keyframe(
            n_inliers=50, n_ref_matches=400, n_close_tracked=200,
            n_close_untracked=0, frames_since_kf=0, max_frames=10,
            min_gap=5) is True

    def test_max_gap_trigger_ignores_gap(self):
        assert need_new_keyframe(
            n_inliers=400, n_ref_matches=400, n_close_tracked=200,
            n_close_untracked=0, frames_since_kf=10, max_frames=10,
            min_gap=5) is True

    def test_decay_suppressed_inside_gap(self):
        kw = dict(n_inliers=100, n_ref_matches=100, n_close_tracked=200,
                  n_close_untracked=0, max_frames=10,
                  last_kf_inliers=400)
        assert need_new_keyframe(frames_since_kf=1, min_gap=2, **kw) is False
        assert need_new_keyframe(frames_since_kf=2, min_gap=2, **kw) is True

    def test_traced_and_host_paths_agree(self):
        for since in range(4):
            host = need_new_keyframe(300, 400, 50, 500, since, 10,
                                     min_gap=2)
            dev = bool(kf_decision(
                jnp.int32(300), jnp.int32(400), jnp.int32(50),
                jnp.int32(500), jnp.int32(since), 10, min_gap=2))
            assert host == dev


class TestKfFrameId:
    def test_insert_records_frame_id(self):
        from object_slam_tpu.config import (SlamConfig, OrbConfig,
                                            CameraConfig, CapacityConfig)
        from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                        orbit_poses)
        from object_slam_tpu.slam.system import SlamSystem

        cfg = SlamConfig(
            camera=CameraConfig(width=160, height=120, fx=130., fy=130.,
                                cx=80., cy=60., dist=(0, 0, 0, 0, 0),
                                bf=13.0, th_depth=40.,
                                depth_map_factor=1.0),
            orb=OrbConfig(n_features=300, n_levels=4),
            caps=CapacityConfig(n_kp=384, max_points=8192,
                                max_keyframes=64))
        scene = SyntheticScene.make(cfg, seed=1)
        sys_ = SlamSystem(cfg)
        for i, T in enumerate(orbit_poses(8, step=0.03)):
            gray, depth, rgb, sem = scene.render_rgbd(T)
            sys_.track_rgbd(gray, depth, rgb,
                            scene.sem_arrays(sem,
                                             cfg.semantic.max_instances),
                            i / 30.0)
        sys_.flush_mapping()
        fids = np.asarray(sys_.map.kf_frame_id)[
            np.asarray(sys_.map.kf_valid)]
        assert len(fids) >= 1
        assert (fids >= 0).all()
        # creation order is monotone in frame id (KF slots are a
        # monotone cursor)
        assert (np.diff(fids) > 0).all()
