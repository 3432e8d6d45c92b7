"""Command-line interface — the engine's analogue of the reference's
launch file (reference launch/mcl_launch.py:19-147), ROS-free.

Subcommands:
  replay      run a recorded trace through the engine, report RMSE/rates
  make-trace  synthesize a golden trace by driving a simulated car in a map
  bench       run the benchmark harness (same as `python bench.py`)
  info        inspect a map or trace file

Map resolution: `--map` accepts either a path to a ROS-style map YAML or a
bare name resolved against --map-dir (the launch file's `map_name` arg).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _resolve_map(map_arg: str, map_dir: str | None, max_range: float):
    from monte_carlo_localization_tpu.mapping import load_map

    p = Path(map_arg)
    if p.suffix in (".yaml", ".yml") and p.exists():
        return load_map(p, max_range_meters=max_range)
    if map_dir:
        candidate = Path(map_dir) / f"{map_arg}.yaml"
        if candidate.exists():
            return load_map(candidate, max_range_meters=max_range)
    raise SystemExit(f"map not found: {map_arg!r} (map_dir={map_dir!r})")


def _load_cfg(args) -> "MCLConfig":
    from monte_carlo_localization_tpu.config import MCLConfig, load_config

    cfg = load_config(args.config) if args.config else MCLConfig()
    overrides = {}
    if args.particles is not None:
        overrides["max_particles"] = args.particles
    if getattr(args, "angle_step", None) is not None:
        overrides["angle_step"] = args.angle_step
    if getattr(args, "raycast", None):
        overrides["raycast_method"] = args.raycast
    if getattr(args, "resample", None):
        overrides["resample_method"] = args.resample
    return cfg.replace(**overrides) if overrides else cfg


def cmd_make_trace(args) -> int:
    from monte_carlo_localization_tpu.runtime import synthesize_trace

    if args.duration <= 0:
        raise SystemExit("--duration must be positive")
    if args.beams <= 0:
        raise SystemExit("--beams must be positive")
    gm = _resolve_map(args.map, args.map_dir, args.max_range)
    t0 = time.perf_counter()
    trace = synthesize_trace(
        gm,
        duration_s=args.duration,
        num_beams=args.beams,
        seed=args.seed,
        speed=args.speed,
    )
    trace.save(args.out)
    print(
        f"wrote {args.out}: {trace.scan_ranges.shape[0]} scans x "
        f"{trace.num_beams} beams, {len(trace.odom_t)} odom msgs, "
        f"{trace.duration:.1f}s sim ({time.perf_counter() - t0:.1f}s wall)"
    )
    return 0


def cmd_replay(args) -> int:
    from monte_carlo_localization_tpu.runtime import MCLNode, Trace

    gm = _resolve_map(args.map, args.map_dir, args.max_range)
    trace = Trace.load(args.trace)
    cfg = _load_cfg(args)
    log = print if args.verbose else (lambda s: None)
    node = MCLNode(gm, cfg, log=log)
    if args.init == "truth" and trace.truth_pose is not None:
        node.initialize_pose(trace.truth_pose[0])
    elif args.init == "global":
        pass  # node starts globally initialized
    res = node.replay(trace)
    out = dict(
        corrections=len(res.times),
        updates_per_sec=round(res.updates_per_sec, 2),
        rmse_xy_m=None if res.rmse_xy is None else round(res.rmse_xy, 4),
        rmse_theta_rad=None if res.rmse_theta is None else round(res.rmse_theta, 4),
        particles=cfg.max_particles,
        beams=int(np.ceil(trace.num_beams / cfg.angle_step)),
        map=gm.name,
    )
    print(json.dumps(out))
    return 0


def cmd_info(args) -> int:
    p = Path(args.path)
    if p.suffix == ".npz":
        from monte_carlo_localization_tpu.runtime import Trace

        t = Trace.load(p)
        print(
            json.dumps(
                dict(
                    kind="trace",
                    map=t.map_name,
                    duration_s=round(t.duration, 2),
                    scans=int(t.scan_ranges.shape[0]),
                    beams=int(t.num_beams),
                    odom_msgs=int(len(t.odom_t)),
                    has_truth=t.truth_t is not None,
                )
            )
        )
    else:
        gm = _resolve_map(str(p), args.map_dir, 12.0)
        print(
            json.dumps(
                dict(
                    kind="map",
                    name=gm.name,
                    height=gm.height,
                    width=gm.width,
                    resolution=gm.resolution,
                    origin=[float(gm.origin_x), float(gm.origin_y), float(gm.origin_yaw)],
                    free_cells=gm.num_free_cells,
                    max_range_px=gm.max_range_px,
                )
            )
        )
    return 0


def cmd_bench(args) -> int:
    import bench as bench_mod  # repo-root bench harness

    return bench_mod.main(args.rest)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="monte_carlo_localization_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--map", required=True, help="map YAML path or name")
    common.add_argument("--map-dir", default=None)
    common.add_argument("--max-range", type=float, default=12.0)

    mt = sub.add_parser("make-trace", parents=[common])
    mt.add_argument("--out", required=True)
    mt.add_argument("--duration", type=float, default=20.0)
    mt.add_argument("--beams", type=int, default=1080)
    mt.add_argument("--speed", type=float, default=1.5)
    mt.add_argument("--seed", type=int, default=0)
    mt.set_defaults(fn=cmd_make_trace)

    rp = sub.add_parser("replay", parents=[common])
    rp.add_argument("--trace", required=True)
    rp.add_argument("--config", default=None, help="mcl_config.yaml")
    rp.add_argument("--particles", type=int, default=None)
    rp.add_argument("--angle-step", type=int, default=None, dest="angle_step")
    rp.add_argument(
        "--raycast",
        choices=["lut_pallas", "lut", "sphere", "dda"],
        default=None,
    )
    rp.add_argument(
        "--resample", choices=["systematic", "multinomial"], default=None
    )
    rp.add_argument("--init", choices=["truth", "global"], default="truth")
    rp.add_argument("-v", "--verbose", action="store_true")
    rp.set_defaults(fn=cmd_replay)

    inf = sub.add_parser("info")
    inf.add_argument("path")
    inf.add_argument("--map-dir", default=None)
    inf.set_defaults(fn=cmd_info)

    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
