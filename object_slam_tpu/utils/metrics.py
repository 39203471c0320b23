"""Structured per-frame metrics stream (SURVEY §5 observability).

The reference's observability is raw `cout` banners per frame
(Tracking.cc:229-275) plus the Pangolin status bar's KF/MP/match counts
(FrameDrawer.cc:156-182). Here the same signals are emitted as one JSON
line per frame to a file/stream — machine-parseable, append-only, and
costing ZERO extra device syncs: every field is host state the tracking
loop already holds (the fused path's single packed sync carries the
inlier count; see SlamSystem._track_fused).

Usage:
    stream = MetricsStream("/tmp/run_metrics.jsonl")
    sys_ = SlamSystem(cfg, metrics=stream)
    ... track ...
    stream.close()

Each record:
    {"frame": int, "ts": float, "state": "OK|LOST|NOT_INITIALIZED",
     "track_ms": float, "n_inliers": int, "kf_inserted": bool,
     "ref_kf": int, "frames_since_kf": int}
"""

from __future__ import annotations

import io
import json
from typing import Optional, Union


class MetricsStream:
    """Append-only JSONL metrics writer with optional buffering."""

    def __init__(self, sink: Union[str, io.TextIOBase],
                 flush_every: int = 1):
        if isinstance(sink, str):
            self._fh = open(sink, "a")
            self._owns = True
        else:
            self._fh = sink
            self._owns = False
        self.flush_every = max(1, flush_every)
        self._n = 0
        self.last: Optional[dict] = None

    def emit(self, **fields):
        self.last = fields
        self._fh.write(json.dumps(fields, separators=(",", ":")) + "\n")
        self._n += 1
        if self._n % self.flush_every == 0:
            self._fh.flush()

    def close(self):
        self._fh.flush()
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
