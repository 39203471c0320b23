"""Direct tests of the semantically constrained pose optimizer
(ObjectOptimizer::PoseOptimization2 analogue, slam/objects.py::_semopt_impl).
"""

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.config import SlamConfig, CapacityConfig, CameraConfig
from object_slam_tpu.geometry import se3, camera as cam_mod
from object_slam_tpu.ops.distance_transform import feature_transform
from object_slam_tpu.semantic.object2d import empty_slab
from object_slam_tpu.slam.frame import FrameData
from object_slam_tpu.slam.map_state import init_map
from object_slam_tpu.slam.objects import ObjectEngine
from object_slam_tpu.slam.tracking import TrackResult
import pytest


def build_semopt_case():
    cfg = SlamConfig(
        camera=CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                            cx=80.0, cy=60.0, dist=(0, 0, 0, 0, 0),
                            bf=13.0, th_depth=40.0, depth_map_factor=1.0),
        caps=CapacityConfig(n_kp=256, max_points=1024, max_keyframes=8,
                            max_objects=8))
    K = cam_mod.Intrinsics.from_config(cfg.camera)
    key = jax.random.PRNGKey(0)
    N = cfg.caps.n_kp

    # world: background points + an "object" cluster
    n_bg, n_obj = 180, 40
    pw_bg = jax.random.uniform(key, (n_bg, 3),
                               minval=jnp.array([-1.5, -1.0, 2.5]),
                               maxval=jnp.array([1.5, 1.0, 5.0]))
    pw_obj = jax.random.uniform(jax.random.PRNGKey(1), (n_obj, 3),
                                minval=jnp.array([-0.3, -0.3, 2.8]),
                                maxval=jnp.array([0.3, 0.3, 3.4]))
    pw = jnp.concatenate([pw_bg, pw_obj])
    n_tot = n_bg + n_obj

    T_true = se3.exp(jnp.array([0.05, -0.02, 0.03, 0.01, -0.02, 0.01]))
    pc = se3.apply(T_true, pw[None])[0]
    uvr = cam_mod.project_stereo(K, pc)
    desc = jax.random.bits(jax.random.PRNGKey(2), (n_tot, 8), jnp.uint32)

    m = init_map(cfg.caps, cfg.objects.history_capacity)
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:n_tot].set(pw),
        pt_desc=m.pt_desc.at[:n_tot].set(desc),
        pt_valid=m.pt_valid.at[:n_tot].set(True),
        pt_obj=m.pt_obj.at[n_bg:n_tot].set(0),
        obj_valid=m.obj_valid.at[0].set(True),
        obj_label=m.obj_label.at[0].set(56),
        obj_track_id=m.obj_track_id.at[0].set(0),
        n_pt=jnp.int32(n_tot), n_obj=jnp.int32(1))

    # frame: observes everything; detection mask = projection of the object
    uv_obj = uvr[n_bg:, :2]
    mask = jnp.zeros((120, 160), bool)
    yy = jnp.clip(jnp.round(uv_obj[:, 1]).astype(int), 2, 117)
    xx = jnp.clip(jnp.round(uv_obj[:, 0]).astype(int), 2, 157)
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            mask = mask.at[yy + dy, xx + dx].set(True)

    obj = empty_slab(cfg.semantic.max_instances, 120, 160, N)
    obj = obj._replace(
        valid=obj.valid.at[0].set(True),
        label=obj.label.at[0].set(56),
        masks=obj.masks.at[0].set(mask),
        ftmap=obj.ftmap.at[0].set(feature_transform(mask)))

    pad = N - n_tot
    uv = jnp.concatenate([uvr[:, :2], jnp.zeros((pad, 2))])
    ur = jnp.concatenate([uvr[:, 2], jnp.full((pad,), -1.0)])
    valid = jnp.concatenate([jnp.ones(n_tot, bool), jnp.zeros(pad, bool)])
    frame = FrameData(
        timestamp=jnp.float32(0), uv_raw=uv, uv=uv, ur=ur,
        depth=jnp.concatenate([pc[:, 2], jnp.full((pad,), -1.0)]),
        level=jnp.zeros(N, jnp.int32), angle=jnp.zeros(N),
        response=jnp.ones(N),
        desc=jnp.concatenate([desc, jnp.zeros((pad, 8), jnp.uint32)]),
        valid=valid, obj=obj,
        obj3d=jnp.full((cfg.semantic.max_instances,), -1, jnp.int32)
        .at[0].set(0),
        kp_pt=jnp.concatenate([jnp.arange(n_tot, dtype=jnp.int32),
                               jnp.full((pad,), -1, jnp.int32)]),
        Tcw=T_true, pose_ok=jnp.array(True))
    return cfg, K, m, frame, T_true, n_tot


@pytest.mark.slow
class TestSemanticPoseOpt:
    def test_semopt_converges_and_counts_constraints(self):
        cfg, K, m, frame, T_true, n_tot = build_semopt_case()
        eng = ObjectEngine(cfg, K)
        # start from a perturbed pose; matched points already in kp_pt
        T0 = se3.retract(T_true, jnp.array([0.02, -0.01, 0.015,
                                            0.005, -0.004, 0.006]))
        res = TrackResult(Tcw=T0, kp_pt=frame.kp_pt,
                          inlier=frame.kp_pt >= 0,
                          n_matches=jnp.int32(n_tot),
                          n_inliers=jnp.int32(n_tot))
        Tcw, kp_pt, inl, n_sem = eng._jit_semopt(m, frame, res)
        err = se3.log(Tcw @ jnp.linalg.inv(T_true))
        assert float(jnp.linalg.norm(err)) < 5e-3
        assert int(n_sem) > 10          # M_semantic edges engaged
        assert int(jnp.sum(inl)) > n_tot * 0.8
