"""Marginal-cost ablation of the fused MCL step at the headline shape.

PERF.md's phase table (kernel 0.45 ms / resample 0.15 / motion 0.1 /
pose+normalize 0.15 at 4000x1080) comes from ``profile_phases``, which
times each phase as a SEPARATE sub-jit dispatch — that includes per-
dispatch overhead the fused production step never pays. This tool
measures what each phase costs INSIDE the fused chained step instead:
it builds step_many variants with one phase ablated (shape-preserving
surrogates) and reports the marginal time per update. The deltas are the
honest upper bound on what fusing/eliminating that phase could save
(VERDICT round-3 item 5).

Usage (on the TPU):  python tools/perf_ablate.py [--particles 4000]
                     [--beams 1080] [--chain 50] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=4000)
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--map", default="Spielberg_map.yaml")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--unroll", type=int, default=0, metavar="U",
                    help="instead of the phase ablation, sweep the FULL "
                         "step at lax.scan unroll factors 1..U (the "
                         "~0.1 ms/update scan-iteration overhead is the "
                         "largest non-kernel item at the headline shape)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter.core import (
        MCLState,
        build_pallas_likelihood,
        expected_pose,
    )
    from monte_carlo_localization_tpu.models.motion import motion_model
    from monte_carlo_localization_tpu.ops.raycast import cast_rays_sphere
    from monte_carlo_localization_tpu.ops.resample import resample_indices

    n, r = args.particles, args.beams
    gm = bench._load_real_map(args.map)
    cfg = MCLConfig(max_particles=n, raycast_method="lut_pallas")
    beams = bench._beams(r)
    gm, query = build_pallas_likelihood(gm, beams, cfg, n)
    from monte_carlo_localization_tpu.models.sensor import SensorModel

    sensor = SensorModel.create(
        max_range_px=gm.max_range_px, resolution=gm.resolution,
        squash_factor=cfg.squash_factor,
    )
    pose0 = bench._nearest_free_pose(gm, bench._center_pose(gm))
    q = np.stack(
        [np.full(r, pose0[0]), np.full(r, pose0[1]), pose0[2] + beams], 1
    ).astype(np.float32)
    scan = np.asarray(cast_rays_sphere(gm, jnp.asarray(q), num_iters=64))
    obs_px_const = sensor.to_pixel_index(jnp.asarray(scan)).astype(jnp.float32)

    disp = (0.05, 0.025, 0.25)

    def make_step(do_resample, do_motion, do_likelihood, do_pose,
                  unroll=1):
        # the map rides as a jit ARGUMENT (captured constants re-embed the
        # multi-GB LUT into the program — the same rule mcl_step follows)
        def step(state, action, obs, gmap):
            key, k_res, k_mot = jax.random.split(state.key, 3)
            if do_resample:
                idx = resample_indices(k_res, state.log_weights,
                                       method="systematic")
                proposal = state.particles[idx]
            else:
                proposal = state.particles
            if do_motion:
                proposal = motion_model(
                    k_mot, proposal, action,
                    dispersion_x=disp[0], dispersion_y=disp[1],
                    dispersion_theta=disp[2], exact_dt_heuristic=True,
                )
            if do_likelihood:
                obs_px = sensor.to_pixel_index(obs).astype(jnp.float32)
                log_w = query(gmap.range_lut, proposal, obs_px,
                              row_map=gmap.lut_row_map)
            else:
                # shape-preserving surrogate keeping a data dependency
                log_w = state.log_weights * 0.999 + proposal[:, 0] * 1e-6
            if do_pose:
                log_q = jax.nn.logsumexp(log_w) - jnp.log(log_w.shape[0] * 1.0)
                log_w = log_w - jax.lax.stop_gradient(jnp.max(log_w))
                pose = expected_pose(proposal, log_w)
            else:
                log_q = log_w[0]
                pose = proposal[0]
            st = MCLState(particles=proposal, log_weights=log_w, key=key,
                          log_quality=log_q.astype(jnp.float32))
            return st, pose

        def steps(state, actions, scans, gmap):
            def body(s, inp):
                a, o = inp
                return step(s, a, o, gmap)
            return jax.lax.scan(body, state, (actions, scans),
                                unroll=unroll)

        return jax.jit(steps, donate_argnums=(0,))

    if args.unroll > 0:
        u = 1
        variants = {}
        while u <= args.unroll:
            variants[f"full_unroll{u}"] = (True, True, True, True, u)
            u *= 2
    else:
        variants = {
            "full": (True, True, True, True),
            "no_pose": (True, True, True, False),
            "no_resample": (False, True, True, True),
            "no_motion": (True, False, True, True),
            "kernel_only": (False, False, True, False),
            "no_kernel": (True, True, False, True),
        }

    from monte_carlo_localization_tpu.filter.init import initialize_pose

    actions = np.tile(np.array([0.05, 0.0, 0.01], np.float32),
                      (args.chain, 1))
    scans = np.tile(scan, (args.chain, 1))

    results = {}
    for name, flags in variants.items():
        fn = make_step(*flags)
        key = jax.random.key(0)
        k1, key = jax.random.split(key)
        particles, logw = initialize_pose(k1, pose0, n)
        state = MCLState(particles=particles, log_weights=logw, key=key)
        state, poses = fn(state, actions, scans, gm)  # compile + warm
        jax.block_until_ready(poses)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                state, poses = fn(state, actions, scans, gm)
            jax.block_until_ready(poses)
            rates.append(
                args.reps * args.chain / (time.perf_counter() - t0)
            )
        med = float(np.median(rates))
        results[name] = med
        print(f"{name:12s} {med:9.2f} updates/s   "
              f"{1e3 / med:7.4f} ms/update   (min {min(rates):.1f}, "
              f"max {max(rates):.1f})")

    if args.unroll > 0:
        return 0
    full_ms = 1e3 / results["full"]
    print("\nmarginal costs inside the fused chained step:")
    for name in ("no_pose", "no_resample", "no_motion", "no_kernel"):
        d = 1e3 / results["full"] - 1e3 / results[name]
        print(f"  {name[3:]:10s} {d:7.4f} ms/update "
              f"({100 * d / full_ms:5.1f}% of the step)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
