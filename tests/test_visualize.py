"""Force visualization (the draw_force_plugin counterpart,
``unitree_gazebo/plugin/draw_force_plugin.cc``): telemetry grf_vis frames
render to an image, from both an in-memory record list and a JSONL file."""

import json

import numpy as np
import pytest

from quaternion_mpc_tpu.utils import telemetry, visualize


def _synthetic_frames(n=20):
    frames = []
    for k in range(n):
        x = 0.02 * k
        feet = np.array(
            [[x + 0.2, 0.14, 0.0], [x + 0.2, -0.14, 0.0],
             [x - 0.2, 0.14, 0.0], [x - 0.2, -0.14, 0.0]]
        )
        grf = np.zeros((4, 3))
        grf[:, 2] = 31.5
        grf[0, 0] = 5.0
        frames.append({
            "ch": "grf_vis",
            "pos": [x, 0.0, 0.3],
            "feet": feet.tolist(),
            "grf": grf.tolist(),
            "contacts": [1.0, 1.0, 0.0, 1.0],
        })
    return frames


def test_render_from_records(tmp_path):
    out = visualize.render_forces(_synthetic_frames(), tmp_path / "f.png")
    assert out.exists() and out.stat().st_size > 5000


def test_render_from_logger_jsonl(tmp_path):
    log = tmp_path / "telemetry.jsonl"
    logger = telemetry.TelemetryLogger(str(log))
    for f in _synthetic_frames(10):
        logger.publish_forces(f["pos"], f["feet"], f["grf"], f["contacts"])
    logger.close()
    # the channel actually landed in the JSONL
    recs = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert sum(r["ch"] == "grf_vis" for r in recs) == 10
    out = visualize.render_forces(log, tmp_path / "f.svg", plane="xy")
    assert out.exists() and out.stat().st_size > 5000


def test_render_requires_frames(tmp_path):
    with pytest.raises(ValueError):
        visualize.render_forces([], tmp_path / "f.png")
