"""Tests for auxiliary subsystems: checkpoint/resume, viewer, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from object_slam_tpu.slam import checkpoint
from object_slam_tpu.slam.map_state import init_map
from object_slam_tpu.config import SlamConfig, CapacityConfig
from object_slam_tpu.utils.profiling import StageProfiler


def populated_map():
    cfg = SlamConfig(caps=CapacityConfig(n_kp=64, max_points=256,
                                         max_keyframes=8, max_objects=8))
    m = init_map(cfg.caps, 16)
    key = jax.random.PRNGKey(0)
    m = m._replace(
        pt_xyz=jax.random.normal(key, m.pt_xyz.shape),
        pt_valid=m.pt_valid.at[:100].set(True),
        kf_valid=m.kf_valid.at[:3].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:3].set(True),
        kf_kp_pt=m.kf_kp_pt.at[0, :50].set(jnp.arange(50)),
        obj_valid=m.obj_valid.at[0].set(True),
        obj_label=m.obj_label.at[0].set(56),
        obj_bbox=m.obj_bbox.at[0].set(jnp.array([0, 0, 0, 1, 1, 1.0])),
        pt_obj=m.pt_obj.at[:20].set(0),
        n_pt=jnp.int32(100), n_kf=jnp.int32(3), n_obj=jnp.int32(1))
    return m


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        m = populated_map()
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, m, {"note": "test"})
        m2, meta = checkpoint.load_map(p)
        assert meta["note"] == "test"
        for f in m._fields:
            np.testing.assert_array_equal(np.asarray(getattr(m, f)),
                                          np.asarray(getattr(m2, f)), f)

    def test_atomic_overwrite(self, tmp_path):
        m = populated_map()
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, m)
        checkpoint.save_map(p, m._replace(n_pt=jnp.int32(7)))
        m2, _ = checkpoint.load_map(p)
        assert int(m2.n_pt) == 7


class TestViewer:
    def test_render_map_3d(self, tmp_path):
        from object_slam_tpu.viz.renderer import render_map_3d
        m = populated_map()
        p = str(tmp_path / "map.png")
        render_map_3d(m, p)
        assert os.path.getsize(p) > 1000

    def test_draw_frame(self):
        from object_slam_tpu.viz.renderer import draw_frame
        from object_slam_tpu.slam.frame import FrameData
        from object_slam_tpu.semantic.object2d import empty_slab
        N = 32
        rgb = np.zeros((48, 64, 3), np.float32)
        obj = empty_slab(4, 48, 64, N)
        obj = obj._replace(
            valid=obj.valid.at[0].set(True),
            masks=obj.masks.at[0, 10:30, 10:30].set(True),
            bbox=obj.bbox.at[0].set(jnp.array([10, 10, 20, 20.0])))
        frame = FrameData(
            timestamp=jnp.float32(0), uv_raw=jnp.full((N, 2), 20.0),
            uv=jnp.full((N, 2), 20.0), ur=jnp.full((N,), -1.0),
            depth=jnp.full((N,), -1.0), level=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N), response=jnp.zeros(N),
            desc=jnp.zeros((N, 8), jnp.uint32), valid=jnp.ones(N, bool),
            obj=obj, obj3d=jnp.full((4,), -1, jnp.int32),
            kp_pt=jnp.full((N,), -1, jnp.int32), Tcw=jnp.eye(4),
            pose_ok=jnp.array(True))
        out = draw_frame(rgb, frame)
        assert out.shape == (48, 64, 3) and out.dtype == np.uint8
        assert out.sum() > 0  # something was drawn


class TestProfiler:
    def test_spans_and_report(self):
        import time
        prof = StageProfiler()
        with prof.span("a"):
            time.sleep(0.01)
        with prof.span("a"):
            time.sleep(0.01)
        with prof.span("b"):
            pass
        s = prof.stats()
        assert s["a"]["n"] == 2
        assert s["a"]["median_ms"] >= 8.0
        assert "a" in prof.report() and "b" in prof.report()

    def test_disabled_noop(self):
        prof = StageProfiler(enabled=False)
        with prof.span("x"):
            pass
        assert prof.stats() == {}


class TestMetricsStream:
    def test_jsonl_records(self, tmp_path):
        import json
        from object_slam_tpu.utils.metrics import MetricsStream
        p = tmp_path / "m.jsonl"
        with MetricsStream(str(p)) as ms:
            ms.emit(frame=0, state="OK", n_inliers=120)
            ms.emit(frame=1, state="LOST", n_inliers=4)
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 2
        recs = [json.loads(l) for l in lines]
        assert recs[0]["n_inliers"] == 120
        assert recs[1]["state"] == "LOST"
        assert ms.last["frame"] == 1

    def test_appends_across_streams(self, tmp_path):
        from object_slam_tpu.utils.metrics import MetricsStream
        p = tmp_path / "m.jsonl"
        for i in range(2):
            with MetricsStream(str(p)) as ms:
                ms.emit(run=i)
        assert len(p.read_text().strip().splitlines()) == 2

    def test_system_emits_per_frame(self):
        """End-to-end: SlamSystem(metrics=...) writes one record per
        track_* call with host-held fields only (no device syncs)."""
        import io
        import json
        import jax.numpy as jnp
        import numpy as np
        from object_slam_tpu.utils.metrics import MetricsStream
        from object_slam_tpu.slam.system import SlamSystem
        from tests.test_slam import small_cfg
        from object_slam_tpu.datasets.synthetic import (SyntheticScene,
                                                        orbit_poses)
        cfg = small_cfg()
        scene = SyntheticScene.make(cfg, seed=1)
        buf = io.StringIO()
        sys_ = SlamSystem(cfg, enable_objects=False,
                          metrics=MetricsStream(buf))
        for i, T in enumerate(orbit_poses(4, step=0.02)):
            gray, depth, rgb, _ = scene.render_rgbd(T)
            sys_.track_rgbd(jnp.asarray(gray), jnp.asarray(depth),
                            jnp.asarray(rgb), None, timestamp=i / 30.0)
        recs = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert len(recs) == 4
        assert recs[0]["kf_inserted"]          # stereo-init KF0
        assert all(r["state"] == "OK" for r in recs)
        assert all(r["track_ms"] > 0 for r in recs)


class TestMapViewer:
    def test_export_map_html(self, tmp_path):
        """Interactive 3D map page — the MapDrawer analogue
        (MapDrawer.cc:83-178,251-356; viz/map_viewer.py): embeds points,
        keyframe poses, spanning tree, object AABBs, and the trajectory
        with layer toggles and a map-growth time slider."""
        from object_slam_tpu.viz.map_viewer import export_map_html
        m = populated_map()
        traj = [np.eye(4), np.eye(4)]
        p = export_map_html(m, trajectory=traj,
                            path=str(tmp_path / "viz" / "map.html"))
        assert os.path.isfile(p)
        html = open(p).read()
        # data payload present: object label, point array, kf block
        assert '"label": 56' in html
        assert '"pts":' in html and '"kf":' in html and '"tree":' in html
        # interaction + layers survive the template substitution
        assert "orbit" in html and "Lobj" in html and "time" in html


class TestScrubber:
    def test_writes_pngs_and_html(self, tmp_path):
        """Offline HTML scrubber — the step-by-step viewer analogue
        (Viewer.cc:77-78,139-155; viz/scrubber.py)."""
        import numpy as np
        import jax.numpy as jnp
        from object_slam_tpu.viz.scrubber import Scrubber
        from object_slam_tpu.slam.frame import FrameData
        from object_slam_tpu.semantic.object2d import empty_slab
        n = 8
        frame = FrameData(
            timestamp=jnp.float32(0.0),
            uv_raw=jnp.asarray([[5.0, 5.0]] * n), uv=jnp.zeros((n, 2)),
            ur=jnp.full((n,), -1.0), depth=jnp.full((n,), -1.0),
            level=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
            response=jnp.ones(n), desc=jnp.zeros((n, 8), jnp.uint32),
            valid=jnp.ones(n, bool), obj=empty_slab(2, 24, 32, n),
            obj3d=jnp.full((2,), -1, jnp.int32),
            kp_pt=jnp.full((n,), -1, jnp.int32),
            Tcw=jnp.eye(4), pose_ok=jnp.array(True))
        rgb = np.zeros((24, 32, 3), np.uint8)
        sc = Scrubber(str(tmp_path / "viz"))
        for i in range(3):
            sc.add_frame(rgb, frame, state="OK", n_inliers=42, kfs=1)
        page = sc.write()
        import os
        assert os.path.isfile(page)
        html = open(page).read()
        assert "frame_00002.png" == sorted(
            p for p in os.listdir(tmp_path / "viz") if p.endswith("png"))[-1]
        assert '"n_inliers": 42' in html and "ArrowRight" in html
