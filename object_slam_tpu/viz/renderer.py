"""Offline visualization: frame overlays and 3D map renders.

Parity with the reference's viewer side-car (`FrameDrawer.cc:38-233`:
keypoint/match overlay, object masks + boxes + labels;
`MapDrawer.cc:44-356`: map/reference points, keyframe frusta, covisibility
graph, object point clouds + AABB wireframes + centroids). The reference
needs a live Pangolin/OpenGL thread; here rendering is offline — PNG
frames / matplotlib 3D — because visualization is not on the metric path
(SURVEY.md §2.2) and headless TPU hosts have no GL.
"""

from __future__ import annotations

import numpy as np

from object_slam_tpu.slam.map_state import MapState, covisibility

_COLORS = np.array([
    [230, 80, 80], [80, 200, 90], [90, 120, 240], [240, 200, 60],
    [200, 90, 220], [70, 210, 210], [245, 140, 50], [150, 150, 150],
], np.uint8)


def draw_frame(rgb, frame, draw_objects: bool = True):
    """FrameDrawer::DrawFrame equivalent — returns an RGB uint8 overlay.

    rgb: [H, W, 3] float/uint8; frame: slam.frame.FrameData.
    Tracked keypoints (kp_pt >= 0) draw green, untracked blue; object
    member keypoints take their instance color; masks alpha-blend; bboxes
    outline.
    """
    img = np.ascontiguousarray(np.asarray(rgb, np.float32))
    H, W = img.shape[:2]

    if draw_objects:
        masks = np.asarray(frame.obj.masks)
        valid = np.asarray(frame.obj.valid)
        for i in range(masks.shape[0]):
            if not valid[i]:
                continue
            c = _COLORS[i % len(_COLORS)].astype(np.float32)
            m = masks[i]
            img[m] = 0.55 * img[m] + 0.45 * c
            x, y, w, h = np.asarray(frame.obj.bbox[i]).astype(int)
            x0, y0 = max(x, 0), max(y, 0)
            x1, y1 = min(x + w, W - 1), min(y + h, H - 1)
            img[y0:y1, x0:x0 + 2] = c
            img[y0:y1, x1 - 1:x1 + 1] = c
            img[y0:y0 + 2, x0:x1] = c
            img[y1 - 1:y1 + 1, x0:x1] = c

    uv = np.asarray(frame.uv_raw)
    ok = np.asarray(frame.valid)
    tracked = np.asarray(frame.kp_pt) >= 0
    kp_obj = np.asarray(frame.obj.kp2obj)
    for n in range(uv.shape[0]):
        if not ok[n]:
            continue
        x, y = int(uv[n, 0]), int(uv[n, 1])
        if not (1 <= x < W - 1 and 1 <= y < H - 1):
            continue
        if kp_obj[n] >= 0:
            c = _COLORS[kp_obj[n] % len(_COLORS)]
        elif tracked[n]:
            c = np.array([40, 230, 60], np.uint8)
        else:
            c = np.array([70, 110, 230], np.uint8)
        img[y - 1:y + 2, x - 1:x + 2] = c
    return np.clip(img, 0, 255).astype(np.uint8)


def save_frame_png(path, rgb, frame, **kw):
    from PIL import Image
    Image.fromarray(draw_frame(rgb, frame, **kw)).save(path)


def render_map_3d(m: MapState, path: str | None = None,
                  show_covisibility: bool = True,
                  show_objects: bool = True, elev: float = -60,
                  azim: float = -90):
    """MapDrawer equivalent: 3D scatter of map points, keyframe frusta
    (as axes), covisibility edges, object boxes. Saves PNG if path given;
    returns the matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(111, projection="3d")

    pts = np.asarray(m.pt_xyz)
    ok = np.asarray(m.pt_valid)
    obj = np.asarray(m.pt_obj)
    free = ok & (obj < 0)
    ax.scatter(pts[free, 0], pts[free, 1], pts[free, 2], s=1, c="k",
               alpha=0.4, linewidths=0)
    if show_objects:
        for j in np.unique(obj[ok & (obj >= 0)]):
            sel = ok & (obj == j)
            c = _COLORS[int(j) % len(_COLORS)] / 255.0
            ax.scatter(pts[sel, 0], pts[sel, 1], pts[sel, 2], s=4,
                       color=c, linewidths=0)
            bb = np.asarray(m.obj_bbox[int(j)])
            if np.isfinite(bb).all():
                _draw_aabb(ax, bb[:3], bb[3:], c)

    kf_pose = np.asarray(m.kf_pose)
    kf_ok = np.asarray(m.kf_valid)
    centers = []
    for k in range(kf_pose.shape[0]):
        if not kf_ok[k]:
            continue
        Twc = np.linalg.inv(kf_pose[k])
        c = Twc[:3, 3]
        centers.append((k, c))
        z = Twc[:3, 2] * 0.15
        ax.plot([c[0], c[0] + z[0]], [c[1], c[1] + z[1]],
                [c[2], c[2] + z[2]], color="g", lw=1)
    if centers:
        cs = np.array([c for _, c in centers])
        ax.plot(cs[:, 0], cs[:, 1], cs[:, 2], color="g", lw=0.8)

    if show_covisibility and len(centers) > 1:
        W = np.asarray(covisibility(m))
        idx = {k: c for k, c in centers}
        for (ka, ca) in centers:
            for (kb, cb) in centers:
                if kb > ka and W[ka, kb] >= 50:
                    ax.plot([ca[0], cb[0]], [ca[1], cb[1]], [ca[2], cb[2]],
                            color="0.6", lw=0.3)

    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((1, 1, 1))
    if path:
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
    return fig


def _draw_aabb(ax, mn, mx, color):
    es = [
        ([mn[0], mx[0]], [mn[1], mn[1]], [mn[2], mn[2]]),
        ([mn[0], mx[0]], [mx[1], mx[1]], [mn[2], mn[2]]),
        ([mn[0], mx[0]], [mn[1], mn[1]], [mx[2], mx[2]]),
        ([mn[0], mx[0]], [mx[1], mx[1]], [mx[2], mx[2]]),
        ([mn[0], mn[0]], [mn[1], mx[1]], [mn[2], mn[2]]),
        ([mx[0], mx[0]], [mn[1], mx[1]], [mn[2], mn[2]]),
        ([mn[0], mn[0]], [mn[1], mx[1]], [mx[2], mx[2]]),
        ([mx[0], mx[0]], [mn[1], mx[1]], [mx[2], mx[2]]),
        ([mn[0], mn[0]], [mn[1], mn[1]], [mn[2], mx[2]]),
        ([mx[0], mx[0]], [mn[1], mn[1]], [mn[2], mx[2]]),
        ([mn[0], mn[0]], [mx[1], mx[1]], [mn[2], mx[2]]),
        ([mx[0], mx[0]], [mx[1], mx[1]], [mn[2], mx[2]]),
    ]
    for xs, ys, zs in es:
        ax.plot(xs, ys, zs, color=color, lw=0.8)
