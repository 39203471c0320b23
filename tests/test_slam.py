"""SLAM-layer tests: map ops, end-to-end tracking regression, objects."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_slam_tpu.config import (SlamConfig, OrbConfig, CapacityConfig,
                                    CameraConfig, SemanticConfig)
from object_slam_tpu.datasets.synthetic import SyntheticScene, orbit_poses
from object_slam_tpu.eval.ate import ate_rmse
from object_slam_tpu.eval import trajectory_io
from object_slam_tpu.slam.system import SlamSystem
from object_slam_tpu.slam.map_state import init_map, covisibility


def small_cfg(**sem_kw):
    return SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                            cx=80.0, cy=60.0, dist=(0, 0, 0, 0, 0),
                            bf=13.0, th_depth=40.0, depth_map_factor=1.0),
        orb=OrbConfig(n_features=300, n_levels=4),
        caps=CapacityConfig(n_kp=384, max_points=8192, max_keyframes=64),
        semantic=SemanticConfig(**sem_kw) if sem_kw else SemanticConfig())


def run_sequence(cfg, scene, poses, **sys_kw):
    sys_ = SlamSystem(cfg, **sys_kw)
    est, gt, oks = [], [], []
    for i, T in enumerate(poses):
        gray, depth, rgb, sem = scene.render_rgbd(T)
        sem_arrays = scene.sem_arrays(sem, cfg.semantic.max_instances)
        f = sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                            jnp.asarray(rgb), sem_arrays,
                            timestamp=float(i) / 30.0)
        est.append(np.linalg.inv(np.asarray(f.Tcw))[:3, 3])
        gt.append(np.linalg.inv(T)[:3, 3])
        oks.append(bool(f.pose_ok))
    return sys_, np.array(est), np.array(gt), oks


@pytest.mark.slow
class TestEndToEnd:
    def test_rgbd_tracking_regression(self):
        """The round-1 e2e slice: 12 frames, all tracked, ATE < 5 cm."""
        cfg = small_cfg()
        scene = SyntheticScene.make(cfg, seed=1, n_objects=2)
        poses = orbit_poses(12, step=0.02)
        sys_, est, gt, oks = run_sequence(cfg, scene, poses,
                                          enable_objects=False)
        assert all(oks), oks
        assert ate_rmse(est, gt) < 0.05
        assert sys_.n_keyframes >= 2
        assert sys_.n_points > 50

    def test_trajectory_io_roundtrip(self, tmp_path):
        cfg = small_cfg()
        scene = SyntheticScene.make(cfg, seed=2, n_objects=0)
        poses = orbit_poses(5, step=0.02)
        sys_, est, gt, oks = run_sequence(cfg, scene, poses,
                                          enable_objects=False)
        traj = sys_.final_trajectory()
        p = tmp_path / "traj.txt"
        trajectory_io.save_trajectory_tum(str(p), traj)
        lines = p.read_text().strip().splitlines()
        assert len(lines) == sum(1 for t in traj if t[2])
        assert len(lines[0].split()) == 8
        pk = tmp_path / "kitti.txt"
        trajectory_io.save_trajectory_kitti(str(pk), traj)
        assert len(pk.read_text().strip().splitlines()) == len(traj)


@pytest.mark.slow
class TestObjects:
    def test_object_creation_and_stability(self, tmp_path):
        """Close large objects + relaxed mask margin: Object3D landmarks
        must appear, persist, and not duplicate across frames."""
        cfg = small_cfg(mask_margin=3, min_kps_rgbd=4)
        scene = SyntheticScene.make(cfg, seed=3, n_objects=2, plane_z=3.0)
        # enlarge the boxes for the low resolution
        for b in scene.boxes:
            b['size'] = 1.0
            b['center'][2] = 2.0
        poses = orbit_poses(8, step=0.015)
        sys_, est, gt, oks = run_sequence(cfg, scene, poses,
                                          enable_objects=True)
        assert all(oks)
        n_obj = int(jnp.sum(sys_.map.obj_valid))
        assert 1 <= n_obj <= 4, n_obj  # 2 true objects; merging keeps it tight
        # object census output
        p = tmp_path / "ObjectInfo.txt"
        trajectory_io.save_object_info(
            str(p), sys_.map.obj_label, sys_.map.obj_valid,
            sys_.objects.semantic_constraints)
        text = p.read_text()
        assert "total:" in text and "semantic_constraints:" in text
        # object points bound
        n_obj_pts = int(jnp.sum(sys_.map.pt_obj >= 0))
        assert n_obj_pts > 5


@pytest.mark.slow
class TestObjectStability:
    def test_identities_persist_and_semopt_engages(self):
        """Regression for the duplicate-scatter association bugs: the same
        two physical objects must keep the same Object3D ids across the
        whole sequence, and the semantically constrained optimizer must
        accumulate constraints every tracked frame."""
        cfg = small_cfg(mask_margin=3, min_kps_rgbd=4)
        scene = SyntheticScene.make(cfg, seed=3, n_objects=2, plane_z=3.0)
        # place the boxes explicitly: the seeded random placement can
        # stack one behind the other (later boxes win the ray ties), which
        # starves the occluded detection of member keypoints
        for k, b in enumerate(scene.boxes):
            b['size'] = 0.8
            b['center'] = np.array([(-0.75, 0.75)[k], 0.1, 2.0])
        poses = orbit_poses(8, step=0.008)
        sys_ = SlamSystem(cfg, enable_objects=True, enable_mapping=True)
        ids_per_frame = []
        for i, T in enumerate(poses):
            gray, depth, rgb, sem = scene.render_rgbd(T)
            sa = scene.sem_arrays(sem, cfg.semantic.max_instances)
            f = sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                                jnp.asarray(rgb), sa, i / 30.0)
            ids_per_frame.append(tuple(np.asarray(f.obj3d)[:2].tolist()))
        # stable identities from frame 0 on
        assert len(set(ids_per_frame)) == 1, ids_per_frame
        assert ids_per_frame[0][0] >= 0 and ids_per_frame[0][1] >= 0
        assert int(jnp.sum(sys_.map.obj_valid)) == 2
        assert sys_.objects.semantic_constraints > 50


class TestKeyframePolicy:
    def test_weak_tracking_inserts(self):
        from object_slam_tpu.slam.tracking import need_new_keyframe
        # healthy early-sequence state: many inliers but below 75% of ref
        assert need_new_keyframe(
            n_inliers=624, n_ref_matches=1024, n_close_tracked=83,
            n_close_untracked=54, frames_since_kf=1, max_frames=30)

    def test_strong_tracking_holds(self):
        from object_slam_tpu.slam.tracking import need_new_keyframe
        assert not need_new_keyframe(
            n_inliers=1000, n_ref_matches=1024, n_close_tracked=400,
            n_close_untracked=10, frames_since_kf=1, max_frames=30)

    def test_max_frames_forces(self):
        from object_slam_tpu.slam.tracking import need_new_keyframe
        assert need_new_keyframe(
            n_inliers=1000, n_ref_matches=1024, n_close_tracked=400,
            n_close_untracked=10, frames_since_kf=30, max_frames=30)

    def test_too_few_inliers_blocks(self):
        from object_slam_tpu.slam.tracking import need_new_keyframe
        assert not need_new_keyframe(
            n_inliers=10, n_ref_matches=1024, n_close_tracked=5,
            n_close_untracked=100, frames_since_kf=40, max_frames=30)


class TestMapOps:
    def test_covisibility_symmetric(self):
        cfg = small_cfg()
        m = init_map(cfg.caps)
        # fabricate 3 KFs sharing points
        m = m._replace(
            kf_valid=m.kf_valid.at[:3].set(True),
            kf_kp_valid=m.kf_kp_valid.at[:3].set(True),
            kf_kp_pt=m.kf_kp_pt
            .at[0, :50].set(jnp.arange(50))
            .at[1, :30].set(jnp.arange(30))
            .at[2, :10].set(jnp.arange(20, 30)))
        W = np.asarray(covisibility(m))
        assert W[0, 1] == 30 and W[1, 0] == 30
        assert W[1, 2] == 10 and W[0, 2] == 10
        assert W[0, 0] == 0

    def test_kf_cull_scale_condition_is_conservative(self):
        """The reference's same-or-finer-scale observer rule
        (LocalMapping.cc:672-683, cfg.mapping.kf_cull_scale_condition)
        can only reduce redundancy counts, so it culls a subset of what
        scale-free counting culls."""
        from object_slam_tpu.slam import map_ops
        cfg = small_cfg()
        m = init_map(cfg.caps)
        rng = np.random.RandomState(0)
        Kc, N = m.kf_kp_pt.shape
        kp = np.full((Kc, N), -1, np.int32)
        for k in range(4):
            kp[k, :200] = np.arange(200)        # all 4 KFs see the same pts
        m = m._replace(
            kf_valid=m.kf_valid.at[:4].set(True),
            kf_kp_pt=jnp.asarray(kp),
            kf_kp_valid=m.kf_kp_valid.at[:4].set(True),
            kf_kp_level=m.kf_kp_level.at[:4, :200].set(
                jnp.asarray(rng.randint(0, 4, (4, 200)))),
            pt_valid=m.pt_valid.at[:200].set(True),
            n_kf=jnp.int32(4))
        m_free = map_ops.cull_keyframes(m, jnp.int32(3),
                                        scale_condition=False)
        m_cond = map_ops.cull_keyframes(m, jnp.int32(3),
                                        scale_condition=True, n_levels=4)
        n_free = int(jnp.sum(m_free.kf_valid))
        n_cond = int(jnp.sum(m_cond.kf_valid))
        assert n_free < 4            # fully redundant -> scale-free culls
        assert n_cond >= n_free      # scale rule is strictly conservative
        # with every observation at the SAME level the two rules agree
        m_same = m._replace(kf_kp_level=m.kf_kp_level.at[:4, :200].set(0))
        m_cond2 = map_ops.cull_keyframes(m_same, jnp.int32(3),
                                         scale_condition=True, n_levels=4)
        assert int(jnp.sum(m_cond2.kf_valid)) == n_free


@pytest.mark.slow
class TestAsyncMapping:
    def test_async_matches_sync_quality(self):
        """Mapping dispatched off the frame path on a snapshot + merged
        (the LocalMapping-thread analogue) must not cost accuracy."""
        cfg = small_cfg()
        scene = SyntheticScene.make(cfg, seed=1, n_objects=2)
        poses = orbit_poses(12, step=0.02)
        _, est_s, gt, oks_s = run_sequence(cfg, scene, poses,
                                           enable_objects=False)
        sys_a, est_a, _, oks_a = run_sequence(cfg, scene, poses,
                                              enable_objects=False,
                                              async_mapping=True)
        assert all(oks_a), oks_a
        assert ate_rmse(est_a, gt) < max(2.0 * ate_rmse(est_s, gt), 0.02)
        assert sys_a._async is not None


@pytest.mark.slow
class TestLocalizationMode:
    def test_vo_survives_mid_sequence_switch(self):
        """activate_localization_mode mid-sequence: temporal VO points
        (Tracking.cc:384-514) keep tracking alive on the frozen map along
        the rest of the trajectory."""
        cfg = small_cfg()
        scene = SyntheticScene.make(cfg, seed=1, n_objects=0)
        poses = orbit_poses(18, step=0.015)
        sys_ = SlamSystem(cfg, enable_objects=False)
        lost_after_switch = 0
        for i, T in enumerate(poses):
            if i == 9:
                sys_.activate_localization_mode()
            gray, depth, rgb, sem = scene.render_rgbd(T)
            f = sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                                jnp.asarray(rgb), timestamp=i / 30.0)
            if i >= 9 and not bool(f.pose_ok):
                lost_after_switch += 1
        assert lost_after_switch <= 1, lost_after_switch
        # the map must not have grown after the switch
        assert sys_.n_keyframes <= 9


@pytest.mark.slow
class TestStereoEndToEnd:
    def test_stereo_tracking_sequence(self):
        """Full stereo pipeline (Frame.cc:706-880 SAD subpixel path) on a
        rendered rectified pair sequence: build from L/R images only —
        depth comes from stereo matching, not the renderer."""
        cfg = small_cfg()
        cfg = dataclasses.replace(cfg, sensor="stereo")
        scene = SyntheticScene.make(cfg, seed=4, n_objects=0)
        from object_slam_tpu.datasets.synthetic import loop_trajectory
        poses = loop_trajectory(120)[:20]
        sys_ = SlamSystem(cfg, enable_objects=False)
        errs, oks = [], []
        for i, T in enumerate(poses):
            gl, gr, depth, rgb, sem = scene.render_stereo(T)
            f = sys_.track_stereo(jnp.asarray(gl), jnp.asarray(gr),
                                  jnp.asarray(rgb), timestamp=i / 30.0)
            errs.append(np.linalg.norm(np.asarray(f.Tcw)[:3, 3] - T[:3, 3]))
            oks.append(bool(f.pose_ok))
        assert sum(oks) >= len(poses) - 1, oks
        errs = np.asarray(errs)
        assert np.sqrt((errs ** 2).mean()) < 0.06, errs


class TestKfPolicyUnification:
    def test_fused_and_host_decisions_agree(self):
        """kf_decision is the single policy source; the jnp-traced (fused
        program) evaluation must equal the host int evaluation on the same
        inputs (VERDICT r2 item 6 — round 2 had two diverging copies)."""
        from object_slam_tpu.slam.tracking import kf_decision, \
            need_new_keyframe
        rng = np.random.RandomState(0)
        for _ in range(200):
            args = dict(
                n_inliers=int(rng.randint(0, 1200)),
                n_ref_matches=int(rng.randint(0, 1200)),
                n_close_tracked=int(rng.randint(0, 300)),
                n_close_untracked=int(rng.randint(0, 300)),
                frames_since_kf=int(rng.randint(0, 40)),
                max_frames=30,
                last_kf_inliers=int(rng.randint(0, 1200)))
            host = need_new_keyframe(**args)
            dev = bool(kf_decision(
                jnp.int32(args["n_inliers"]),
                jnp.int32(args["n_ref_matches"]),
                jnp.int32(args["n_close_tracked"]),
                jnp.int32(args["n_close_untracked"]),
                jnp.int32(args["frames_since_kf"]), 30,
                last_kf_inliers=jnp.int32(args["last_kf_inliers"])))
            assert host == dev, args
