"""The mega-fused MCL step: ONE Pallas program per correction.

The classic chained step (filter/core.mcl_step under lax.scan) costs
0.556 ms at the 4000x1080 headline, of which only 0.344 ms is the
likelihood kernel — the rest is the resample/motion/pose XLA fusions and
a ~0.107 ms per-step-body residual of inter-kernel gaps around the
custom call (PERF.md:54-106, the round-4 marginal-cost ablation). This
module folds the ENTIRE correction into one kernel launch
(reference MCL() src/particle_filter.cpp:652-694 — the whole step as one
unit):

  grid step 0 (prologue), on top of the normal block work:
    * systematic resample WITHOUT cumsum/scatter/gather primitives —
      none of which Mosaic lowers well. The weight CDF is built with two
      triangular matmuls (lane prefix via W @ U128, sublane prefix via
      L32strict @ row-totals); the CDF inversion + ancestor row gather
      fuse into ONE one-hot matmul per 128-slot tile:
      onehot[i, j] = 1[g_j >= i] - 1[g_{j-1} >= i]  (exact 0/1 in f32,
      g = N*cdf - u0 nondecreasing), proposal_tile = onehot @ particles
      on the MXU at HIGHEST precision (exact for f32 coordinates).
    * the reference's arc/straight motion model on the proposal columns,
      consuming pre-generated N(0,1) noise (an input, NOT in-kernel
      prng: the jax.random stream is reproduced exactly outside the
      scan, keeping the mega path step-for-step comparable to the
      classic one).
    * window addressing (world->grid->LUT subrow) for every particle,
      written to SMEM scratch via a VMEM->SMEM DMA so the per-block DMA
      loop can consume the indices as scalars.
  grid steps 0..nb-1: the production double-buffered one-window-DMA-per-
    particle likelihood pipeline of ops/pallas_lut.py, unchanged in
    structure (same rotate + analytic beam model + compact-beam MXU
    path), with per-particle logp written to SMEM scratch.
  grid step nb-1 (epilogue): logp DMA'd back SMEM->VMEM; out-of-bounds
    and pad lanes masked; max-shift normalization; softmax moment sums
    (sum w*x, w*y, w*sin, w*cos, Z, max) written to a tiny SMEM output —
    the pose atan2/divide runs OUTSIDE the scan, vectorized over all K
    steps at once (Mosaic has no atan2; the cost is zero per step).

Dense-LUT maps only: the row-compacted LUT's per-cell row_map gather
(grid_map.lut_row_map) cannot live in-kernel without one extra DMA per
particle — on giant maps the classic path remains. Single member, no
subbin/dedup (those stay classic too).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_localization_tpu.ops.pallas_lut import (
    LANE,
    _erf,
    beam_geometry,
    entries_per_subrow,
    required_row_stride,
    window_entries,
)

_NEG = -1e30  # pad-lane log weight


def _pad128(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def build_mega_step_fn(
    t_bins: int,
    beam_angles: np.ndarray,
    num_particles: int,
    *,
    height: int,
    width: int,
    resolution: float,
    origin_x: float,
    origin_y: float,
    max_range_px: int,
    row_stride: int,
    z_hit: float,
    z_short: float,
    z_max: float,
    z_rand: float,
    sigma_hit: float,
    inv_squash: float,
    motion_dispersion: tuple[float, float, float] = (0.05, 0.025, 0.25),
    block: int = 80,
    interpret: bool = False,
    lut_dtype: np.dtype = np.uint8,
    compact_beams: bool | None = None,
    debug_phases: str = "all",
):
    """Returns (mega, info). ``mega(lut3, particles, logw2d, noise, obs
    _lanes, scalars) -> (prop (NP,3), logw2d' (NPS,128), sums (1,8))``.

    particles: (NP, 3) f32 (NP = N padded to a lane multiple; pad rows
    arbitrary). logw2d: (NPS, 128) f32, flat id = sub*128 + lane, pads
    at _NEG. noise: (NP, 3) f32 N(0,1). scalars: (8,) f32
    [ds, dtheta, straight_flag, u0, 0...] — the motion displacement form
    AFTER the dt-heuristic (computed host/XLA-side, vectorized over K).
    sums: [S_wx, S_wy, S_wsin, S_wcos, Z, max_logp, 0, 0].
    """
    r = len(beam_angles)
    base, k, e = beam_geometry(beam_angles, t_bins)
    lut_dtype = np.dtype(lut_dtype)
    itemsize = lut_dtype.itemsize
    eps = entries_per_subrow(itemsize)
    if eps & (eps - 1):
        raise ValueError("subrow entries must be a power of two")
    eps_shift = int(math.log2(eps))
    sub_lanes = eps // LANE
    wents = window_entries(t_bins, beam_angles, itemsize)
    need = required_row_stride(t_bins, beam_angles, itemsize)
    if row_stride < need:
        raise ValueError(f"row_stride {row_stride} < required {need}")
    if row_stride % eps != 0:
        raise ValueError(f"row_stride must be a multiple of {eps}")
    n = num_particles
    if n % block != 0:
        raise ValueError(f"num_particles {n} must divide by block {block}")
    npd = _pad128(n)  # padded particle rows
    nps = npd // LANE  # sublane count of the (NPS, 128) logw layout
    nblocks = n // block
    s_sub = wents // LANE
    y_rows = wents // eps

    # static rotated-lane layout (one lane per beam) — as in pallas_lut
    masks_np = np.zeros((s_sub, LANE), np.float32)
    obs_layout = np.zeros((s_sub * LANE,), np.int64)
    for j in range(r):
        q = k * j + int(e[j])
        masks_np[q // LANE, q % LANE] = 1.0
        obs_layout[q] = j
    if compact_beams is None:
        compact_beams = r <= LANE
    if compact_beams and r > LANE:
        raise ValueError(f"compact_beams needs r <= {LANE}")
    if compact_beams:
        sel_np = np.zeros((s_sub, LANE, LANE), np.float32)
        masks_c_np = np.zeros((1, LANE), np.float32)
        for j in range(r):
            q = k * j + int(e[j])
            sel_np[q // LANE, q % LANE, j] = 1.0
            masks_c_np[0, j] = 1.0

    m = float(max_range_px)
    gauss_coef = z_hit / (sigma_hit * math.sqrt(2.0 * math.pi))
    inv2s2 = 1.0 / (2.0 * sigma_hit * sigma_hit)
    sq2 = math.sqrt(2.0) * sigma_hit
    dx_s, dy_s, dth_s = (float(v) for v in motion_dispersion)
    t_over_2pi = t_bins / (2.0 * math.pi)
    inv_2pi = 1.0 / (2.0 * math.pi)
    spe = row_stride // eps  # subrows per LUT row
    two_pi = 2.0 * math.pi

    # triangular cumsum constants (upper-tri incl. diag for the inclusive
    # lane prefix; strict lower-tri for the exclusive sublane prefix)
    u128_np = np.triu(np.ones((LANE, LANE), np.float32))
    l32_np = np.tril(np.ones((nps, nps), np.float32), k=-1)

    hi = jax.lax.Precision.HIGHEST

    def rotate_flat(x, rem):
        c = jax.lax.rem(rem, LANE)
        a = jax.lax.div(rem, LANE)
        x1 = pltpu.roll(x, -c, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        carry = lane >= (LANE - c)
        xa = pltpu.roll(x1, -a, 0)
        xb = pltpu.roll(x1, -(a + 1), 0)
        return jnp.where(carry, xb, xa)

    def beam_model(d, obs, mask):
        d = jnp.minimum(d, m)
        z = obs - d
        p = gauss_coef * jnp.exp(-(z * z) * inv2s2)
        p = p + jnp.where(
            obs < d, 2.0 * z_short * (d - obs) / jnp.maximum(d, 1.0), 0.0
        )
        p = p + jnp.where(obs >= m, z_max, 0.0)
        p = p + jnp.where(obs < m, z_rand / m, 0.0)
        gauss_sum = 0.5 * (
            _erf((m - d + 0.5) / sq2) - _erf((-d - 0.5) / sq2)
        )
        norm = (
            z_hit * gauss_sum
            + jnp.where(d > 0, z_short * (d + 1.0), 0.0)
            + z_max
            + z_rand
        )
        return (jnp.log(jnp.maximum(p, 1e-35)) - jnp.log(norm)) * mask

    def kernel(*args):
        if compact_beams:
            (parts_ref, logw_ref, noise_ref, obs_ref, sca_ref, masks_ref,
             sel_ref, u128_ref, l32_ref, lut_ref,
             prop_out, logw_out, sums_out,
             win_scratch, dma_sems, y0s, rems, logps, oob_col,
             prop_s) = args
        else:
            (parts_ref, logw_ref, noise_ref, obs_ref, sca_ref, masks_ref,
             u128_ref, l32_ref, lut_ref,
             prop_out, logw_out, sums_out,
             win_scratch, dma_sems, y0s, rems, logps, oob_col,
             prop_s) = args
            sel_ref = None
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        # ---------------- prologue: resample + motion + addresses ------
        if debug_phases in ("all", "no_epi", "pro_only"):
          @pl.when(i == 0)
          def _():
            # particles/noise/prop live in ANY memory and cross to VMEM by
            # ONE manual DMA here: BlockSpec-managed VMEM operands are
            # re-copied by the pipeline EVERY grid step (measured ~30 us/
            # step at three 2 MB operands — 3.4x the whole classic step)
            def prologue(parts_v, noise_v, iosem):
              cp_p = pltpu.make_async_copy(parts_ref, parts_v, iosem.at[0])
              cp_n = pltpu.make_async_copy(noise_ref, noise_v, iosem.at[1])
              cp_p.start()
              cp_n.start()
              cp_p.wait()
              cp_n.wait()
              u0 = sca_ref[3]
              lw = logw_ref[:]  # (NPS, 128), pads at _NEG
              mx = jnp.max(lw)
              w = jnp.exp(lw - mx)  # pads -> 0
              lane_cs = jax.lax.dot_general(
                  w, u128_ref[:], (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32, precision=hi,
              )
              row_tot = lane_cs[:, LANE - 1:LANE]  # (NPS, 1)
              row_pre = jax.lax.dot_general(
                  l32_ref[:], row_tot, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32, precision=hi,
              )
              cs = lane_cs + row_pre  # inclusive cumsum, id = sub*128+lane
              # normalize by the TRUE SCALAR total: a rank-0 reduction
              # splats fine, while a (1,1) vector slice cannot broadcast to
              # (NPS,128) in one Mosaic op ("Broadcast in both sublanes and
              # lanes" — and a two-stage broadcast_to gets folded back)
              z_tot = jnp.sum(w)
              g2d = (n / 1.0) * (cs / z_tot) - u0
              g = g2d.reshape(1, npd)  # flatten relayout
              gp = pltpu.roll(g, 1, 1)
              lane_i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
              gp = jnp.where(lane_i == 0, -u0, gp)

              parts = parts_v[:]  # (NP, 3)
              tiles = []
              for t in range(nps):
                  slots = t * LANE + jax.lax.broadcasted_iota(
                      jnp.int32, (LANE, 1), 0
                  ).astype(jnp.float32)
                  # onehot[i, j] = 1[g_{j-1} < i <= g_j] as ONE fused
                  # select — materializing the two indicator masks
                  # separately cost 2 MB of extra VMEM transients
                  onehot = jnp.where(
                      (g >= slots) & (gp < slots), 1.0, 0.0
                  )  # (128, NP)
                  tiles.append(jax.lax.dot_general(
                      onehot, parts, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32, precision=hi,
                  ))  # (128, 3)
              prop = jnp.concatenate(tiles, axis=0)  # (NP, 3)

              # ---- motion (displacement form; heuristic applied outside)
              ds = sca_ref[0]
              dth = sca_ref[1]
              straight = sca_ref[2]  # 1.0 = straight branch
              x = prop[:, 0:1]
              y = prop[:, 1:2]
              th = prop[:, 2:3]
              safe_dth = jnp.where(jnp.abs(dth) < 1e-12, 1.0, dth)
              chord = ds * (2.0 * jnp.sin(dth * 0.5) / safe_dth)
              mid = th + dth * 0.5
              x_arc = x + chord * jnp.cos(mid)
              y_arc = y + chord * jnp.sin(mid)
              x_st = x + ds * jnp.cos(th)
              y_st = y + ds * jnp.sin(th)
              nz = noise_v[:]
              nx = jnp.where(straight > 0.5, x_st, x_arc) + nz[:, 0:1] * dx_s
              ny = jnp.where(straight > 0.5, y_st, y_arc) + nz[:, 1:2] * dy_s
              nth = (
                  jnp.where(straight > 0.5, th, th + dth)
                  + nz[:, 2:3] * dth_s
              )
              # wrap to [-pi, pi) without atan2 (Mosaic has none); the
              # classic path's arctan2(sin, cos) differs only at the wrap
              # knife edge
              nth = nth - two_pi * jnp.floor(nth * inv_2pi + 0.5)
              prop = jnp.concatenate([nx, ny, nth], axis=1)
              prop_s[:] = prop
              cp_o = pltpu.make_async_copy(prop_s, prop_out, iosem.at[2])
              cp_o.start()
              cp_o.wait()

              # ---- window addressing (dense LUT: cell -> row identity)
              gx = ((nx - origin_x) / resolution).astype(jnp.int32)
              gy = ((ny - origin_y) / resolution).astype(jnp.int32)
              oob = (
                  (gx < 0) | (gx >= width) | (gy < 0) | (gy >= height)
              )
              cell = (
                  jnp.clip(gy, 0, height - 1) * width
                  + jnp.clip(gx, 0, width - 1)
              )
              b0 = jnp.round(nth * t_over_2pi).astype(jnp.int32) + base
              b0 = jnp.where(b0 < 0, b0 + t_bins, b0)
              b0 = jnp.where(b0 >= t_bins, b0 - t_bins, b0)
              b0 = jnp.where(b0 < 0, b0 + t_bins, b0)  # base can be < -T/2
              rem = jax.lax.bitwise_and(b0, eps - 1)
              y0 = cell * spe + jax.lax.shift_right_logical(b0, eps_shift)
              y0 = jnp.where(oob, 0, y0)
              # ROW layout (1, NP) everywhere SMEM is involved: SMEM scratch
              # is lane-tiled like vector memory, so a (NP, 1) column costs
              # 128x its payload (2 MB at NP=4096 — over the 1 MB SMEM
              # budget); a (1, NP) row packs into NP/128 tiles
              oob_col[:] = (
                  oob.astype(jnp.float32).reshape(nps, LANE).reshape(1, npd)
              )

              # hand the per-particle indices to the scalar core: VMEM
              # staging buffer -> SMEM DMA (the block DMA loop reads them
              # as scalars)
              def to_smem(val, smem):
                  def scoped(tmp, tsem):
                      tmp[:] = val.reshape(nps, LANE).reshape(1, npd)
                      pltpu.make_async_copy(tmp, smem, tsem).start()
                      pltpu.make_async_copy(tmp, smem, tsem).wait()

                  pl.run_scoped(
                      scoped,
                      tmp=pltpu.VMEM((1, npd), jnp.int32),
                      tsem=pltpu.SemaphoreType.DMA(()),
                  )

              to_smem(y0, y0s)
              to_smem(rem, rems)

            pl.run_scoped(
                prologue,
                parts_v=pltpu.VMEM((npd, 3), jnp.float32),
                noise_v=pltpu.VMEM((npd, 3), jnp.float32),
                iosem=pltpu.SemaphoreType.DMA((3,)),
            )

        # ---------------- likelihood block pipeline --------------------
        if debug_phases == "pro_only":
            return
        def start_dmas(buf, blk):
            for s in range(block):
                pltpu.make_async_copy(
                    lut_ref.at[pl.ds(y0s[0, blk * block + s], y_rows)],
                    win_scratch.at[buf, s],
                    dma_sems.at[buf, s],
                ).start()

        def wait_dmas(buf, blk):
            for s in range(block):
                pltpu.make_async_copy(
                    lut_ref.at[pl.ds(y0s[0, blk * block + s], y_rows)],
                    win_scratch.at[buf, s],
                    dma_sems.at[buf, s],
                ).wait()

        @pl.when(i == 0)
        def _():
            start_dmas(0, 0)

        @pl.when(i + 1 < nblocks)
        def _():
            start_dmas(nxt, i + 1)

        wait_dmas(slot, i)

        rows = []
        for s in range(block):
            win = win_scratch[slot, s].reshape(s_sub, LANE)
            win = win.astype(jnp.int32).astype(jnp.float32)
            rows.append(rotate_flat(win, rems[0, i * block + s]))
        if compact_beams:
            w3 = jnp.stack(rows)  # (block, s_sub, LANE)
            acc = jnp.zeros((block, LANE), jnp.float32)
            for ss in range(s_sub):
                acc = acc + jax.lax.dot_general(
                    w3[:, ss, :], sel_ref[ss],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            logp = beam_model(acc, obs_ref[:], masks_ref[:])
        else:
            logp = beam_model(
                jnp.stack(rows), obs_ref[:][None], masks_ref[:][None]
            )
        for s in range(block):
            logps[0, i * block + s] = inv_squash * jnp.sum(logp[s])

        # ---------------- epilogue: normalize + pose moment sums -------
        if debug_phases != "all":
            return
        @pl.when(i == nblocks - 1)
        def _():
            def scoped(lp_v, lsem):
                pltpu.make_async_copy(logps, lp_v, lsem).start()
                pltpu.make_async_copy(logps, lp_v, lsem).wait()
                lp = lp_v[:]  # (1, NP) row
                lp = jnp.where(oob_col[:] > 0.5, -1e4, lp)
                # everything below runs in the dense (NPS, 128) layout:
                # the first epilogue used (1,NP)@(NP,1) MXU dots for the
                # moment sums — a degenerate M=N=1 matmul Mosaic lowers
                # pathologically (measured +1.19 ms/step, 60% of the
                # whole mega step)
                lp2 = lp.reshape(nps, LANE)
                idx2 = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (nps, LANE), 0
                    ) * LANE
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (nps, LANE), 1
                    )
                )
                lp2 = jnp.where(idx2 >= n, _NEG, lp2)
                mx = jnp.max(lp2)
                ww = jnp.exp(lp2 - mx)  # pads -> 0
                prop = prop_s[:]
                x2 = prop[:, 0:1].reshape(nps, LANE)
                y2 = prop[:, 1:2].reshape(nps, LANE)
                th2 = prop[:, 2:3].reshape(nps, LANE)
                sums_out[0, 0] = jnp.sum(ww * x2)
                sums_out[0, 1] = jnp.sum(ww * y2)
                sums_out[0, 2] = jnp.sum(ww * jnp.sin(th2))
                sums_out[0, 3] = jnp.sum(ww * jnp.cos(th2))
                sums_out[0, 4] = jnp.sum(ww)
                sums_out[0, 5] = mx
                sums_out[0, 6] = 0.0
                sums_out[0, 7] = 0.0
                logw_out[:] = lp2 - mx

            pl.run_scoped(
                scoped,
                lp_v=pltpu.VMEM((1, npd), jnp.float32),
                lsem=pltpu.SemaphoreType.DMA(()),
            )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # particles (one-shot DMA)
        pl.BlockSpec((nps, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # noise (one-shot DMA)
        (
            pl.BlockSpec((1, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            if compact_beams
            else pl.BlockSpec((s_sub, LANE), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (8,)
        (
            pl.BlockSpec((1, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            if compact_beams
            else pl.BlockSpec((s_sub, LANE), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        ),
    ]
    if compact_beams:
        in_specs.append(
            pl.BlockSpec((s_sub, LANE, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs += [
        pl.BlockSpec((LANE, LANE), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nps, nps), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # LUT
    ]

    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        # the default scoped-VMEM budget (16 MB) is tight for the
        # prologue's (128, NP) one-hot transients next to the window
        # scratch; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # prop (one-shot DMA out)
            pl.BlockSpec((nps, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npd, 3), jnp.float32),
            jax.ShapeDtypeStruct((nps, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, block, y_rows, sub_lanes, LANE),
                jnp.uint8 if itemsize == 1 else jnp.uint16,
            ),
            pltpu.SemaphoreType.DMA((2, block)),
            pltpu.SMEM((1, npd), jnp.int32),  # y0
            pltpu.SMEM((1, npd), jnp.int32),  # rem
            pltpu.SMEM((1, npd), jnp.float32),  # logp
            pltpu.VMEM((1, npd), jnp.float32),  # oob
            pltpu.VMEM((npd, 3), jnp.float32),  # prop (persists to epilogue)
        ],
        interpret=interpret,
    )

    obs_layout_flat = obs_layout.reshape(-1)

    def prep_obs(obs_px_k: jnp.ndarray) -> jnp.ndarray:
        """(K, R) observed px -> (K, 1|s_sub, LANE) kernel lane layout."""
        obs_clip = jnp.minimum(obs_px_k, m)
        kk = obs_clip.shape[0]
        if compact_beams:
            if r < LANE:
                obs_clip = jnp.concatenate(
                    [obs_clip,
                     jnp.full((kk, LANE - r), m, jnp.float32)], axis=1
                )
            return obs_clip.reshape(kk, 1, LANE)
        return obs_clip[:, jnp.asarray(obs_layout_flat)].reshape(
            kk, s_sub, LANE
        )

    consts = dict(
        masks=jnp.asarray(masks_c_np if compact_beams else masks_np),
        sel=jnp.asarray(sel_np) if compact_beams else None,
        u128=jnp.asarray(u128_np),
        l32=jnp.asarray(l32_np),
    )

    def mega(lut3, particles, logw2d, noise, obs_lanes, scalars):
        args = [particles, logw2d, noise, obs_lanes, scalars,
                consts["masks"]]
        if compact_beams:
            args.append(consts["sel"])
        args += [consts["u128"], consts["l32"], lut3]
        return call(*args)

    info = dict(
        npd=npd, nps=nps, nblocks=nblocks, block=block,
        compact_beams=compact_beams, window_entries=wents,
        s_sub=s_sub,
    )
    return mega, prep_obs, info
