"""Chained corrections through the mega-fused single-program step.

Host/XLA side of ops/pallas_mega.py: reproduces the classic
``ParticleFilter.step_many`` contract — same RNG stream (the per-step
key chain, resample u0 and motion normals are generated EXACTLY as
filter/core.mcl_step does, just hoisted out of the scan), same state
semantics (max-shifted log weights, raw-logsumexp ``log_quality``), same
returned poses — with the entire scan body reduced to ONE Pallas call.
Everything else (dt-heuristic displacement, obs lane layout, pose
atan2/divide) is vectorized over all K steps OUTSIDE the scan, so it
costs one fusion per chain instead of one per correction.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.filter.core import MCLState
from monte_carlo_localization_tpu.mapping.grid_map import GridMap
from monte_carlo_localization_tpu.models.motion import reconstruct_velocity
from monte_carlo_localization_tpu.models.sensor import SensorModel
from monte_carlo_localization_tpu.ops.pallas_mega import (
    _NEG,
    build_mega_step_fn,
)


def mega_supported(grid_map: GridMap, cfg: MCLConfig) -> bool:
    """The mega step serves dense-LUT single maps on the standard
    analytic path (PERF.md: the compact row_map gather cannot live
    in-kernel; subbin/dedup stay classic)."""
    return (
        grid_map.occupancy.ndim == 2
        and grid_map.lut_row_map is None
        and cfg.sensor_model_mode == "analytic"
        and cfg.resample_method == "systematic"
        and not cfg.pallas_subbin
        and cfg.pallas_dedup_slots <= 0
    )


class MegaStepper:
    """Owns the compiled mega kernel + the jitted chained-step wrapper.

    Built by ``ParticleFilter._rebuild_step`` when
    ``cfg.pallas_mega`` is on and :func:`mega_supported` holds; the
    filter's ``step_many`` then dispatches here (``step`` stays classic —
    a single correction is dispatch-bound either way).
    """

    def __init__(
        self,
        grid_map: GridMap,
        beam_angles: np.ndarray,
        cfg: MCLConfig,
        num_particles: int,
        sensor: SensorModel,
        block: int,
        interpret: bool = False,
    ):
        from monte_carlo_localization_tpu.mapping.range_lut import lut_dtype

        if grid_map.range_lut is None:
            raise ValueError(
                "mega step needs the kernel-stride dense LUT attached "
                "(build_pallas_likelihood does this)"
            )
        row_stride = grid_map.lut_row_stride or grid_map.lut_theta_bins
        self.cfg = cfg
        self.sensor = sensor
        self.n = num_particles
        dtype = lut_dtype(grid_map.max_range_px)
        self._mega, self._prep_obs, self.info = build_mega_step_fn(
            grid_map.lut_theta_bins,
            np.asarray(beam_angles),
            num_particles,
            height=grid_map.height,
            width=grid_map.width,
            resolution=grid_map.resolution,
            origin_x=float(grid_map.origin_x),
            origin_y=float(grid_map.origin_y),
            max_range_px=grid_map.max_range_px,
            row_stride=row_stride,
            z_hit=cfg.z_hit,
            z_short=cfg.z_short,
            z_max=cfg.z_max,
            z_rand=cfg.z_rand,
            sigma_hit=cfg.sigma_hit,
            inv_squash=cfg.inv_squash_factor,
            motion_dispersion=(
                cfg.motion_dispersion_x,
                cfg.motion_dispersion_y,
                cfg.motion_dispersion_theta,
            ),
            block=block,
            interpret=interpret,
            lut_dtype=dtype,
        )
        sub_lanes = 512 // dtype.itemsize // 128
        # the LUT rides as a jit ARGUMENT (a captured constant re-embeds
        # the multi-GB buffer per compile — rejected by the axon
        # remote-compile backend; see filter/core.mcl_step's note)
        self._lut3 = grid_map.range_lut.reshape(-1, sub_lanes, 128)
        self._jit = jax.jit(
            partial(_mega_step_many, self), donate_argnums=(1, 2)
        )

    # -- public API (mirrors ParticleFilter.step_many) --
    def step_many(self, state: MCLState, actions, observed_m):
        actions = jnp.asarray(actions, jnp.float32)
        observed_m = jnp.asarray(observed_m, jnp.float32)
        parts, lw2d, key, poses, logq = self._jit(
            self._lut3,
            state.particles,
            state.log_weights,
            state.key,
            actions,
            observed_m,
        )
        new_state = MCLState(
            particles=parts, log_weights=lw2d, key=key,
            log_quality=logq,
        )
        return new_state, poses


def _mega_step_many(stepper: MegaStepper, lut3, particles, log_weights,
                    key, actions, observed_m):
    """jitted body: K chained corrections, one pallas call per step."""
    cfg = stepper.cfg
    n = stepper.n
    npd = stepper.info["npd"]
    nps = stepper.info["nps"]
    kk = actions.shape[0]

    # ---- the classic per-step key chain, hoisted out of the scan:
    # mcl_step does key, k_res, k_mot = split(key, 3); systematic
    # resampling draws u0 = uniform(k_res, ()); motion draws
    # normal(k_mot, (N, 3)) — reproduced draw-for-draw
    def key_chain(k, _):
        k2, k_res, k_mot = jax.random.split(k, 3)
        return k2, (k_res, k_mot)

    key_out, (k_res, k_mot) = jax.lax.scan(
        key_chain, key, None, length=kk
    )
    u0 = jax.vmap(lambda kr: jax.random.uniform(kr, ()))(k_res)  # (K,)
    noise = jax.vmap(
        lambda km: jax.random.normal(km, (n, 3), jnp.float32)
    )(k_mot)  # (K, N, 3)
    if npd != n:
        noise = jnp.pad(noise, ((0, 0), (0, npd - n), (0, 0)))

    # ---- motion displacement form (the dt heuristic, vectorized (K,))
    if cfg.exact_dt_heuristic:
        dt, v, omega = jax.vmap(reconstruct_velocity)(actions)
        ds = v * dt
        dth = omega * dt
        straight = (jnp.abs(omega) < 1e-6).astype(jnp.float32)
    else:
        ds = actions[:, 0]
        dth = actions[:, 2]
        straight = (jnp.abs(dth) < 1e-6).astype(jnp.float32)
    scalars = jnp.stack(
        [ds, dth, straight, u0,
         jnp.zeros_like(u0), jnp.zeros_like(u0),
         jnp.zeros_like(u0), jnp.zeros_like(u0)],
        axis=1,
    )  # (K, 8)

    obs_px = stepper.sensor.to_pixel_index(observed_m).astype(jnp.float32)
    obs_lanes = stepper._prep_obs(obs_px)  # (K, ., LANE)

    # ---- state layout conversion (once per chain)
    parts0 = particles
    if npd != n:
        parts0 = jnp.pad(parts0, ((0, npd - n), (0, 0)))
    lw0 = log_weights
    if npd != n:
        lw0 = jnp.concatenate(
            [lw0, jnp.full((npd - n,), _NEG, jnp.float32)]
        )
    lw0 = lw0.reshape(nps, 128)

    def body(carry, xs):
        parts, lw2d = carry
        nz, ob, sc = xs
        prop, lw_new, sums = stepper._mega(lut3, parts, lw2d, nz, ob, sc)
        return (prop, lw_new), sums

    (parts_f, lw_f), sums = jax.lax.scan(
        body, (parts0, lw0), (noise, obs_lanes, scalars)
    )

    # ---- pose + quality, vectorized over the whole chain (outside)
    s = sums[:, 0, :]  # (K, 8)
    z = s[:, 4]
    poses = jnp.stack(
        [s[:, 0] / z, s[:, 1] / z, jnp.arctan2(s[:, 2], s[:, 3])],
        axis=1,
    )
    logq = (s[:, 5] + jnp.log(z) - jnp.log(float(n))).astype(jnp.float32)

    parts_out = parts_f[:n]
    lw_out = lw_f.reshape(-1)[:n]
    return parts_out, lw_out, key_out, poses, logq[-1]
