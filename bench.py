"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): full MCL updates/sec at 4000 particles x
1080 beams (which implies particle x beam ray-casts/sec = value * 4.32M).
The reference publishes no numbers; its qualitative rate is ~6 Hz at
2000 x 60 on a robot CPU (reference README.md:83). vs_baseline is
reported against the north-star target of 1000 updates/s on one chip.

Usage:
  python bench.py                 # headline config on the default device
  python bench.py --quick         # fewer timed iters (CI / smoke)
  python bench.py --config N      # BASELINE.json workload configs 1-5
  python bench.py --all           # run every config, one JSON line each
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

NORTH_STAR_UPDATES_PER_SEC = 1000.0


def _build_single(num_particles, num_beams, map_hw, march_iters, seed=0,
                  method="lut"):
    import jax
    import jax.numpy as jnp

    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter import ParticleFilter
    from monte_carlo_localization_tpu.mapping import random_obstacle_world
    from monte_carlo_localization_tpu.ops.raycast import cast_rays_sphere

    gm = random_obstacle_world(
        height=map_hw, width=map_hw, num_obstacles=max(10, map_hw // 12), seed=seed
    )
    cfg = MCLConfig(
        max_particles=num_particles,
        sphere_march_iters=march_iters,
        raycast_method=method,
    )
    pf = ParticleFilter(gm, cfg)
    inc = 1.5 * np.pi / max(num_beams - 1, 1)
    beams = (-0.75 * np.pi + np.arange(num_beams) * inc).astype(np.float32)
    pf.set_beam_angles(beams)
    # a real scan from the map center so the likelihood path is realistic
    center = np.array(
        [map_hw * gm.resolution / 2, map_hw * gm.resolution / 2, 0.3], np.float32
    )
    q = np.stack(
        [np.full(num_beams, center[0]), np.full(num_beams, center[1]),
         center[2] + beams], 1,
    ).astype(np.float32)
    scan = np.asarray(cast_rays_sphere(gm, jnp.asarray(q), num_iters=64))
    state = pf.init_pose(center, seed=1)
    return pf, state, scan


def bench_updates(num_particles, num_beams, map_hw=768, march_iters=48,
                  warmup=3, iters=50, method="lut"):
    """Time the fused MCL step; returns updates/sec."""
    import jax

    pf, state, scan = _build_single(
        num_particles, num_beams, map_hw, march_iters, method=method
    )
    action = np.array([0.05, 0.0, 0.01], np.float32)
    for _ in range(warmup):
        state, pose = pf.step(state, action, scan)
    jax.block_until_ready(pose)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, pose = pf.step(state, action, scan)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0
    return iters / dt


def bench_fleet(fleet_size, num_particles, num_beams=60, map_hw=400,
                march_iters=48, warmup=2, iters=20, method="lut"):
    """Vmapped fleet: returns fleet-steps/sec (each = fleet_size MCL updates)."""
    import jax
    import jax.numpy as jnp

    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.mapping import random_obstacle_world
    from monte_carlo_localization_tpu.parallel import FleetFilter

    gm = random_obstacle_world(height=map_hw, width=map_hw, seed=0)
    beams = np.linspace(-np.pi * 0.75, np.pi * 0.75, num_beams).astype(np.float32)
    ff = FleetFilter(
        gm,
        fleet_size=fleet_size,
        config=MCLConfig(
            max_particles=num_particles,
            sphere_march_iters=march_iters,
            raycast_method=method,
        ),
        beam_angles=beams,
    )
    center = np.array(
        [map_hw * gm.resolution / 2, map_hw * gm.resolution / 2, 0.3], np.float32
    )
    state = ff.init_pose(np.tile(center, (fleet_size, 1)), seed=1)
    scan = np.full((fleet_size, num_beams), 4.0, np.float32)
    actions = np.zeros((fleet_size, 3), np.float32)
    for _ in range(warmup):
        state, poses = ff.step(state, actions, scan)
    jax.block_until_ready(poses)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, poses = ff.step(state, actions, scan)
    jax.block_until_ready(poses)
    dt = time.perf_counter() - t0
    return iters / dt


CONFIGS = {
    # BASELINE.json workload configs (synthetic stand-ins for the map assets)
    1: dict(kind="single", particles=4000, beams=60, map_hw=768,
            method="lut_pallas",
            note="config#1: 4000p x 60-beam downsampled (levine-like)"),
    2: dict(kind="single", particles=4000, beams=60, map_hw=400,
            method="lut_pallas",
            note="config#2: sibal1-like fast inner loop"),
    3: dict(kind="single", particles=4000, beams=1080, map_hw=1536,
            method="lut_pallas",
            note="config#3: Spielberg-like full 1080-beam scans"),
    4: dict(kind="single", particles=100_000, beams=60, map_hw=1024,
            method="lut_pallas",
            note="config#4: 100k-particle global localization"),
    5: dict(kind="fleet", fleet=64, particles=4000, beams=60, map_hw=400,
            method="lut",  # vmapped fleets use the XLA LUT path
            note="config#5: 64-car fleet x 4000 particles"),
}


def run_config(n, quick=False):
    c = CONFIGS[n]
    iters = 10 if quick else (30 if c.get("particles", 0) >= 100_000 else 50)
    if c["kind"] == "single":
        ups = bench_updates(
            c["particles"], c["beams"], c["map_hw"], warmup=2 if quick else 3,
            iters=iters, method=c.get("method", "lut_pallas"),
        )
        rays = ups * c["particles"] * c["beams"]
        return dict(
            metric=f"mcl_updates_per_sec[{c['note']}]",
            value=round(ups, 2),
            unit="updates/s",
            vs_baseline=round(ups / NORTH_STAR_UPDATES_PER_SEC, 4),
            rays_per_sec=round(rays),
        )
    ups = bench_fleet(
        c["fleet"], c["particles"], c["beams"], c["map_hw"],
        warmup=1 if quick else 2, iters=max(5, iters // 4),
        method=c.get("method", "lut"),
    )
    return dict(
        metric=f"fleet_steps_per_sec[{c['note']}]",
        value=round(ups, 2),
        unit="fleet-steps/s",
        vs_baseline=round(ups * c["fleet"] / NORTH_STAR_UPDATES_PER_SEC, 4),
        rays_per_sec=round(ups * c["fleet"] * c["particles"] * c["beams"]),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--config", type=int, default=None, choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--march-iters", type=int, default=48)
    ap.add_argument("--method", choices=["lut_pallas", "lut", "sphere", "dda"], default="lut")
    args = ap.parse_args(argv)

    if args.all:
        for n in sorted(CONFIGS):
            print(json.dumps(run_config(n, quick=args.quick)))
        return 0
    if args.config is not None:
        print(json.dumps(run_config(args.config, quick=args.quick)))
        return 0

    # headline: 4000 particles x 1080 beams, full fused step
    iters = 10 if args.quick else 100
    ups = bench_updates(
        4000, 1080, map_hw=768, march_iters=args.march_iters,
        warmup=2 if args.quick else 5, iters=iters, method=args.method,
    )
    print(
        json.dumps(
            dict(
                metric="mcl_updates_per_sec@4000x1080",
                value=round(ups, 2),
                unit="updates/s",
                vs_baseline=round(ups / NORTH_STAR_UPDATES_PER_SEC, 4),
            )
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
