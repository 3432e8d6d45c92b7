"""End-to-end CLI smoke tests (CPU): the quickstart surface of README.md.

make-trace → replay → replay --chained → checkpoint round trip, all
through ``cli.main`` exactly as a user would invoke them (the ROS-free
analogue of the reference's launch-file workflow,
reference launch/mcl_launch.py:19-147).
"""

import json

import numpy as np
import pytest
import yaml
from PIL import Image

from monte_carlo_localization_tpu import cli


@pytest.fixture(scope="module")
def map_yaml(tmp_path_factory):
    """A small boxed world written as PNG+YAML (ROS map_server schema)."""
    d = tmp_path_factory.mktemp("cli_map")
    img = np.full((80, 100), 254, np.uint8)
    img[:3, :] = 0
    img[-3:, :] = 0
    img[:, :3] = 0
    img[:, -3:] = 0
    img[30:40, 40:55] = 0  # an obstacle for range structure
    Image.fromarray(img).save(d / "world.png")
    (d / "world.yaml").write_text(
        yaml.dump(
            dict(image="world.png", resolution=0.05,
                 origin=[0.0, 0.0, 0.0], negate=0,
                 occupied_thresh=0.65, free_thresh=0.196)
        )
    )
    return str(d / "world.yaml")


def _run(capsys, argv):
    rc = cli.main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_quickstart_surface(map_yaml, tmp_path, capsys):
    trace = str(tmp_path / "t.npz")
    # make-trace (short sim, modest beams: CPU DDA)
    rc = cli.main(["make-trace", "--map", map_yaml, "--out", trace,
                   "--duration", "2", "--beams", "120"])
    assert rc == 0
    capsys.readouterr()

    # per-dispatch replay with a JSONL sink
    rec = str(tmp_path / "run.jsonl")
    out = _run(capsys, [
        "replay", "--map", map_yaml, "--trace", trace,
        "--particles", "256", "--angle-step", "2", "--raycast", "lut",
        "--record-out", rec,
    ])
    assert out["corrections"] > 10
    assert out["rmse_xy_m"] is not None and out["rmse_xy_m"] < 0.3
    first = json.loads(open(rec).readline())
    assert "topic" in first and "t" in first

    # chained replay + checkpoint out
    ck = str(tmp_path / "state.npz")
    out2 = _run(capsys, [
        "replay", "--map", map_yaml, "--trace", trace,
        "--particles", "256", "--angle-step", "2", "--raycast", "lut",
        "--chained", "--checkpoint-out", ck,
    ])
    assert out2["corrections"] == out["corrections"] + 1  # incl. first scan
    assert out2["rmse_xy_m"] < 0.3

    # resume from the checkpoint: the restored cloud starts at the END of
    # the first run (so re-replaying the same trace from t=0 is a
    # kidnapped-robot scenario — assert the mechanics, not convergence)
    out3 = _run(capsys, [
        "replay", "--map", map_yaml, "--trace", trace,
        "--particles", "256", "--angle-step", "2", "--raycast", "lut",
        "--resume-from", ck,
    ])
    assert out3["corrections"] > 10
    assert np.isfinite(out3["rmse_xy_m"])


def test_info_command(map_yaml, capsys):
    rc = cli.main(["info", map_yaml])
    assert rc == 0
    assert "world" in capsys.readouterr().out


def test_profile_dir_writes_trace(map_yaml, tmp_path, capsys):
    """--profile-dir captures a jax.profiler device trace around the
    replay (best-effort: skips cleanly if the backend can't profile)."""
    import os

    trace = str(tmp_path / "t2.npz")
    assert cli.main(["make-trace", "--map", map_yaml, "--out", trace,
                     "--duration", "1", "--beams", "60"]) == 0
    capsys.readouterr()
    prof = tmp_path / "prof"
    out = _run(capsys, [
        "replay", "--map", map_yaml, "--trace", trace,
        "--particles", "128", "--angle-step", "2", "--raycast", "lut",
        "--profile-dir", str(prof),
    ])
    assert out["corrections"] > 2
    wrote = prof.exists() and any(
        f for _, _, fs in os.walk(prof) for f in fs
    )
    if not wrote:
        pytest.skip("backend does not support jax.profiler traces")


def test_baseline_command(map_yaml, tmp_path, capsys):
    """cli baseline: the measured CPU-reference harness (numpy + native
    DDA, reference-exact phase stats) replays a trace and reports RMSE +
    the six TimingStats phases."""
    trace = str(tmp_path / "t3.npz")
    assert cli.main(["make-trace", "--map", map_yaml, "--out", trace,
                     "--duration", "1.5", "--beams", "90"]) == 0
    capsys.readouterr()
    out = _run(capsys, [
        "baseline", "--map", map_yaml, "--trace", trace,
        "--particles", "200", "--angle-step", "3", "--corrections", "12",
    ])
    assert out["engine"] == "cpu_reference"
    assert out["corrections"] > 5
    assert out["rmse_xy_m"] < 0.3
    assert set(out["phase_ms"]) >= {"total", "raycast", "sensor",
                                    "motion", "resample"}
