"""Telemetry/observability: the LeggedLogger-equivalent metric surface.

The reference publishes `/debug/torso_odom`, `/debug/torso_odom_d`,
`/debug/mpc_grf` (contact flags + per-leg GRF norms) and `/debug/mpc_time`
(per-solve latency, ms) over ROS (``include/utils/LeggedLogger.hpp:27-143``).
Here the same channels are host-side ring buffers + a JSON-lines sink, plus
the fleet-scale counters the reference lacks (SURVEY.md §5 tracing): solves/s
and p50/p99 solve latency — the framework's north-star metric surface.

Feed it AFTER device execution (bulk pulls at sweep boundaries); it never
touches jax inside the hot loop.
"""

from __future__ import annotations

import json
import pathlib
import time
from collections import deque
from typing import Optional

import numpy as np


class LatencyTracker:
    """Rolling solve-latency stats (p50/p99/mean, solves/s)."""

    def __init__(self, window: int = 4096):
        self._lat = deque(maxlen=window)
        self._solves = deque(maxlen=window)  # (t_end, n_solves)

    def record(self, seconds: float, n_solves: int = 1) -> None:
        self._lat.append(seconds / max(n_solves, 1))
        self._solves.append((time.monotonic(), n_solves))

    def stats(self) -> dict:
        if not self._lat:
            return {"p50_ms": None, "p99_ms": None, "mean_ms": None, "solves_per_sec": 0.0}
        lat = np.asarray(self._lat)
        t0 = self._solves[0][0]
        t1 = self._solves[-1][0]
        total = sum(n for _, n in self._solves)
        rate = total / (t1 - t0) if t1 > t0 else float(total)
        return {
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            "mean_ms": float(lat.mean() * 1e3),
            "solves_per_sec": float(rate),
        }


class TelemetryLogger:
    """JSONL channel logger (LeggedLogger.hpp topic surface).

    Channels mirror the reference debug topics:
      odom        — torso position/quat/velocity      (:64-82)
      odom_d      — desired torso state               (:84-97)
      mpc_grf     — contact flags + per-leg GRF norms (:103-117)
      mpc_time    — per-solve latency ms              (:99-100)
    plus fleet aggregates (alive fraction, mean cost) from psum'd metrics.
    """

    def __init__(self, path: Optional[str] = None, window: int = 4096):
        self.path = pathlib.Path(path) if path else None
        self._fh = self.path.open("a") if self.path else None
        self.latency = LatencyTracker(window)
        self._step = 0

    def log(self, channel: str, payload: dict) -> None:
        rec = {"t": time.time(), "step": self._step, "ch": channel, **payload}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")

    def publish_state(
        self,
        pos=None,
        quat=None,
        vel=None,
        pos_d=None,
        quat_d=None,
        grf=None,
        contacts=None,
        mpc_time_s: Optional[float] = None,
        fleet_metrics: Optional[dict] = None,
        n_solves: int = 1,
    ) -> None:
        """One control-tick record (LeggedLogger::publish_state parity)."""
        if pos is not None:
            self.log("odom", {
                "pos": np.asarray(pos).tolist(),
                "quat": np.asarray(quat).tolist() if quat is not None else None,
                "vel": np.asarray(vel).tolist() if vel is not None else None,
            })
        if pos_d is not None or quat_d is not None:
            self.log("odom_d", {
                "pos_d": np.asarray(pos_d).tolist() if pos_d is not None else None,
                "quat_d": np.asarray(quat_d).tolist() if quat_d is not None else None,
            })
        if grf is not None:
            norms = np.linalg.norm(np.asarray(grf), axis=-1)
            self.log("mpc_grf", {
                "contacts": np.asarray(contacts).tolist() if contacts is not None else None,
                "grf_norm": norms.tolist(),
            })
        if mpc_time_s is not None:
            self.latency.record(mpc_time_s, n_solves)
            self.log("mpc_time", {"ms": mpc_time_s * 1e3, "n_solves": n_solves})
        if fleet_metrics:
            self.log("fleet", {k: float(v) for k, v in fleet_metrics.items()})
        self._step += 1

    def publish_forces(self, pos, feet_world, grf_world, contacts=None) -> None:
        """Force-visualization frame (the draw_force_plugin channel,
        unitree_gazebo/plugin/draw_force_plugin.cc): full world-frame GRF
        vectors at the world-frame foot points, renderable by
        `utils.visualize.render_forces`."""
        self.log("grf_vis", {
            "pos": np.asarray(pos).tolist(),
            "feet": np.asarray(feet_world).tolist(),
            "grf": np.asarray(grf_world).tolist(),
            "contacts": (
                np.asarray(contacts).tolist() if contacts is not None else None
            ),
        })

    def summary(self) -> dict:
        return self.latency.stats()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
