"""Interleaved same-process A/B: classic chained step vs the mega-fused
single-program step (VERDICT round-4 item 1's 'done' bar).

Sequential A/Bs through the remote-TPU transport are untrustworthy (the
same program measured 1468 and 1800 updates/s in neighboring minutes —
PERF.md); this tool alternates the two variants inside ONE process so
transport drift hits both equally, and reports median-of-R with min/max.

Both variants share ONE map object and ONE dense LUT buffer (the mega
step is dense-only; MCL_LUT_DENSE_MAX is raised here so even Spielberg
builds dense — 12.3 GB, fits v5e HBM — and the classic arm runs the SAME
dense LUT, so the delta is exactly the fusion).

Usage (on the TPU):
    python tools/mega_ab.py [--particles 4000] [--beams 1080]
        [--chain 50] [--reps 5] [--rounds 3]
        [--map Spielberg_map.yaml | --synthetic]
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
# dense LUTs up to 14 GiB: the whole point of this A/B (see docstring)
os.environ.setdefault("MCL_LUT_DENSE_MAX", str(14 << 30))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=4000)
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--map", default="Spielberg_map.yaml")
    ap.add_argument("--synthetic", action="store_true",
                    help="768^2 synthetic world instead of the real map")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mega-blocks", default="0",
                    help="comma list of pallas_block caps for extra mega "
                         "arms (0 = auto)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter.core import ParticleFilter
    from monte_carlo_localization_tpu.ops.raycast import cast_rays_sphere

    n, r = args.particles, args.beams
    gm = (
        bench._synthetic_map(768)
        if args.synthetic
        else bench._load_real_map(args.map)
    )
    beams = bench._beams(r)
    t_build0 = time.perf_counter()
    pf_c = ParticleFilter(
        gm,
        MCLConfig(max_particles=n, raycast_method="lut_pallas"),
        beam_angles=beams,
    )
    print(f"# classic built (dense LUT) in "
          f"{time.perf_counter() - t_build0:.1f}s; "
          f"row_map={pf_c.grid_map.lut_row_map is not None}",
          flush=True)
    if pf_c.grid_map.lut_row_map is not None:
        print("# map built COMPACT — mega needs dense; aborting",
              file=sys.stderr)
        return 2
    megas = {}
    for blk in (int(b) for b in args.mega_blocks.split(",")):
        pf_m = ParticleFilter(
            pf_c.grid_map,  # share the attached LUT buffer
            MCLConfig(max_particles=n, raycast_method="lut_pallas",
                      pallas_mega=True, pallas_block=blk),
            beam_angles=beams,
        )
        assert pf_m._mega_stepper is not None
        megas[f"mega_b{pf_m._mega_stepper.info['block']}"] = pf_m

    pose0 = bench._nearest_free_pose(gm, bench._center_pose(gm))
    q = np.stack(
        [np.full(r, pose0[0]), np.full(r, pose0[1]), pose0[2] + beams], 1
    ).astype(np.float32)
    scan = np.asarray(
        cast_rays_sphere(pf_c.grid_map, jnp.asarray(q), num_iters=64)
    )
    actions = np.tile(np.array([0.05, 0.0, 0.01], np.float32),
                      (args.chain, 1))
    scans = np.tile(scan, (args.chain, 1))

    arms = {}
    for name, pf in [("classic", pf_c)] + sorted(megas.items()):
        st = pf.init_pose(pose0, seed=0)
        t0 = time.perf_counter()
        st, poses = pf.step_many(st, actions, scans)  # compile + warm
        jax.block_until_ready(poses)
        print(f"# {name}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
        err = float(np.linalg.norm(np.asarray(poses)[-1, :2] - pose0[:2]))
        assert np.isfinite(err) and err < 1.5, (name, err)
        arms[name] = dict(pf=pf, state=st, rates=[])

    # interleave: classic, mega, classic, mega, ... per round
    for rd in range(args.rounds):
        for name, arm in arms.items():
            pf, st = arm["pf"], arm["state"]
            t0 = time.perf_counter()
            for _ in range(args.reps):
                st, poses = pf.step_many(st, actions, scans)
            jax.block_until_ready(poses)
            arm["state"] = st
            rate = args.reps * args.chain / (time.perf_counter() - t0)
            arm["rates"].append(rate)
            print(f"round {rd} {name:8s} {rate:9.2f} updates/s",
                  flush=True)

    print()
    meds = {}
    for name, arm in arms.items():
        rs = arm["rates"]
        meds[name] = float(np.median(rs))
        print(f"{name:8s} median {meds[name]:9.2f} updates/s "
              f"(min {min(rs):.1f}, max {max(rs):.1f}, n={len(rs)})")
        err = float(np.linalg.norm(
            np.asarray(arm["pf"].step_many(
                arm["state"], actions[:1], scans[:1]
            )[1])[-1, :2] - pose0[:2]
        ))
        print(f"{name:8s} still tracking: err {err:.3f} m")
    for name, med in meds.items():
        if name != "classic":
            print(f"{name} / classic = {med / meds['classic']:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
