"""Tests for the fused Pallas LUT+likelihood kernel (interpret mode on CPU).

The kernel is the production fast path (ops/pallas_lut.py); these tests pin
its full contract — window DMA addressing, the 512-residual rotation, the
static lane layout, the in-kernel analytic beam model (reference likelihood
contract, reference src/particle_filter.cpp:506-583) — against a numpy
oracle that replicates the kernel's own bin decomposition with exact erf.
"""

import math

import numpy as np
import pytest
from scipy.special import erf as scipy_erf

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.mapping.range_lut import lut_dtype
from monte_carlo_localization_tpu.ops.pallas_lut import (
    MAX_RESIDUAL_SHIFTS,
    SUB,
    beam_geometry,
    build_lut_query_fn,
    entries_per_subrow,
    required_row_stride,
    suggest_theta_bins,
    window_bytes,
    window_entries,
)

Z_HIT, Z_SHORT, Z_MAX, Z_RAND = 0.80, 0.05, 0.05, 0.10
SIGMA = 8.0
INV_SQUASH = 1.0 / 2.2


def _make_lut(rng, n_cells, row_stride, t_bins, max_range_px):
    """Random padded LUT with proper wraparound tail (entry b = bin b%T)."""
    base = rng.integers(0, max_range_px + 1, size=(n_cells, t_bins)).astype(
        lut_dtype(max_range_px)
    )
    reps = -(-row_stride // t_bins)
    return np.tile(base, (1, reps))[:, :row_stride].copy()


def _oracle_logw(
    lut2d, particles, obs_px, beams, t_bins, max_range_px,
    *, height, width, resolution, origin_x, origin_y, subbin=False,
):
    """Numpy twin of the kernel's likelihood — same bin decomposition
    (b0 + j + e_j over the padded row), exact erf. With ``subbin`` the
    heading's fractional bin position (computed in f32, matching the
    kernel) lerps each beam between its bin and the +1 neighbor."""
    base, k, e = beam_geometry(beams, t_bins)
    n = len(particles)
    r = len(beams)
    m = float(max_range_px)

    gx = (particles[:, 0] - origin_x) / resolution
    gy = (particles[:, 1] - origin_y) / resolution
    gx = gx.astype(np.int32)
    gy = gy.astype(np.int32)
    oob = (gx < 0) | (gx >= width) | (gy < 0) | (gy >= height)
    cell = np.clip(gy, 0, height - 1) * width + np.clip(gx, 0, width - 1)
    if subbin:
        # the kernel computes the bin position in f32
        bpos = (
            particles[:, 2].astype(np.float32)
            * np.float32(t_bins / (2 * math.pi))
        )
        bf = np.floor(bpos)
        frac = (bpos - bf).astype(np.float64)
        b0 = bf.astype(np.int64)
    else:
        b0 = np.round(
            particles[:, 2] * (t_bins / (2 * math.pi))
        ).astype(np.int64)
    b0 = (b0 + base) % t_bins

    bins = b0[:, None] + k * np.arange(r)[None, :] + e[None, :]  # padded-row idx
    d = lut2d[cell[:, None], bins].astype(np.float64)
    if subbin:
        d1 = lut2d[cell[:, None], bins + 1].astype(np.float64)
        d = d + frac[:, None] * (d1 - d)
    d = np.minimum(d, m)
    obs = np.minimum(obs_px, m)[None, :]

    gauss_coef = Z_HIT / (SIGMA * math.sqrt(2 * math.pi))
    z = obs - d
    p = gauss_coef * np.exp(-(z * z) / (2 * SIGMA * SIGMA))
    p = p + np.where(obs < d, 2 * Z_SHORT * (d - obs) / np.maximum(d, 1.0), 0)
    p = p + np.where(obs >= m, Z_MAX, 0.0)
    p = p + np.where(obs < m, Z_RAND / m, 0.0)
    sq2 = math.sqrt(2.0) * SIGMA
    gauss_sum = 0.5 * (
        scipy_erf((m - d + 0.5) / sq2) - scipy_erf((-d - 0.5) / sq2)
    )
    norm = (
        Z_HIT * gauss_sum
        + np.where(d > 0, Z_SHORT * (d + 1.0), 0.0)
        + Z_MAX
        + Z_RAND
    )
    logp = np.log(np.maximum(p, 1e-35)) - np.log(norm)
    logw = INV_SQUASH * logp.sum(axis=1)
    return np.where(oob, -1e4, logw)


def _build(beams, num_particles, *, height, width, resolution=0.05,
           origin_x=0.0, origin_y=0.0, max_range_px=120, t_bins=None,
           block=16, dedup_slots=0, compact_beams=None, subbin=False,
           dedup_matmul=False):
    t = t_bins or suggest_theta_bins(beams)
    dtype = lut_dtype(max_range_px)
    stride = required_row_stride(t, beams, itemsize=dtype.itemsize)
    query, info = build_lut_query_fn(
        t, beams, num_particles,
        height=height, width=width, resolution=resolution,
        origin_x=origin_x, origin_y=origin_y, max_range_px=max_range_px,
        row_stride=stride,
        z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
        sigma_hit=SIGMA, inv_squash=INV_SQUASH,
        block=block, interpret=True, lut_dtype=dtype,
        dedup_slots=dedup_slots, compact_beams=compact_beams,
        subbin=subbin, dedup_matmul=dedup_matmul,
    )
    return query, info, t, stride


def _run_case(rng, beams, n, height=24, width=32, t_bins=None,
              theta_gen=None, xy_gen=None, max_range_px=120, subbin=False):
    query, info, t, stride = _build(
        beams, n, height=height, width=width, t_bins=t_bins,
        max_range_px=max_range_px, subbin=subbin,
    )
    lut2d = _make_lut(rng, height * width, stride, t, max_range_px)
    res, ox, oy = 0.05, 0.0, 0.0
    if xy_gen is None:
        x = rng.uniform(0.01, width * res - 0.01, n)
        y = rng.uniform(0.01, height * res - 0.01, n)
    else:
        x, y = xy_gen(n)
    theta = (
        rng.uniform(-2 * math.pi, 2 * math.pi, n)
        if theta_gen is None
        else theta_gen(n)
    )
    particles = np.stack([x, y, theta], 1).astype(np.float32)
    obs_px = rng.uniform(0, max_range_px, len(beams)).astype(np.float32)

    got = np.asarray(
        query(jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
              jnp.asarray(obs_px))
    )
    want = _oracle_logw(
        lut2d, particles.astype(np.float64), obs_px.astype(np.float64),
        beams, t, max_range_px,
        height=height, width=width, resolution=res, origin_x=ox, origin_y=oy,
        subbin=subbin,
    )
    return got, want


def _assert_close(got, want, tol=2e-3):
    # f32 kernel vs f64 oracle; A&S erf approx |err| < 1.5e-7 per term
    np.testing.assert_allclose(got, want, rtol=0, atol=tol)


BEAMS_60 = np.linspace(-2.35, 2.35, 60).astype(np.float32)


class TestGeometryHelpers:
    def test_suggest_theta_bins_near_target(self):
        # downsampled 60-beam scan must keep fine angular quantization by
        # using k bins per beam step, not degrade to one bin per beam
        t = suggest_theta_bins(BEAMS_60)
        assert 1000 <= t <= 2000
        base, k, e = beam_geometry(BEAMS_60, t)
        assert k >= 2
        # full-res 1080-beam scan lands on k=1
        beams1080 = np.linspace(-0.75 * np.pi, 0.75 * np.pi, 1080)
        t2 = suggest_theta_bins(beams1080)
        assert beam_geometry(beams1080, t2)[1] == 1

    def test_beam_geometry_reconstructs_bins(self):
        for t in (79, 160, 1439):
            base, k, e = beam_geometry(BEAMS_60, t)
            delta = 2 * math.pi / t
            bins = np.round(BEAMS_60.astype(np.float64) / delta).astype(int)
            rec = base + k * np.arange(len(BEAMS_60)) + e
            np.testing.assert_array_equal(rec, bins)
            assert e.min() == 0

    def test_window_and_stride_invariants(self):
        for itemsize in (1, 2):
            eps = entries_per_subrow(itemsize)
            for t in (79, suggest_theta_bins(BEAMS_60)):
                w = window_entries(t, BEAMS_60, itemsize)
                s = required_row_stride(t, BEAMS_60, itemsize)
                assert w % eps == 0 and s % eps == 0
                base, k, e = beam_geometry(BEAMS_60, t)
                span = k * (len(BEAMS_60) - 1) + e.max() + 1
                # any window start b0 < t must fit: floor(b0) + w <= s
                assert eps * ((t - 1) // eps) + w <= s
                assert w >= span
        # u8 compat alias counts entries == bytes
        t = suggest_theta_bins(BEAMS_60)
        assert window_bytes(t, BEAMS_60) == window_entries(t, BEAMS_60, 1)

    def test_pick_block(self):
        from monte_carlo_localization_tpu.ops.pallas_lut import pick_block

        assert pick_block(4000, 80) == 80
        assert pick_block(2000, 80) == 80
        assert pick_block(256, 80) == 64  # largest mult-of-8 divisor <= 80
        assert pick_block(4000, 16) == 16
        assert pick_block(12, 80) == 12  # whole-array block is also legal
        assert pick_block(100, 80) == 100  # no mult-of-8 divisor: whole array
        assert pick_block(100_000, 80) == 80
        # fleet: b == npm is NOT the whole (members*npm) output array, so a
        # per-member count with no multiple-of-8 divisor has no valid block
        with pytest.raises(ValueError, match="multiple of 8"):
            pick_block(100, 80, total_rows=400)
        assert pick_block(128, 80, total_rows=512) == 64

    def test_resolve_block_cap(self):
        from monte_carlo_localization_tpu.ops.pallas_lut import (
            pick_block,
            resolve_block_cap,
        )

        # explicit caps pass through untouched
        assert resolve_block_cap(4000, 80) == 80
        assert resolve_block_cap(100_000, 24) == 24
        # auto (0, the MCLConfig default): 80 for small filters, 160 once
        # the per-member count reaches 32k (measured v5e crossover)
        assert resolve_block_cap(4000, 0) == 80
        assert resolve_block_cap(32768 - 1, 0) == 80
        assert resolve_block_cap(32768, 0) == 160
        assert resolve_block_cap(100_000, 0) == 160
        # the cap is keyed by TOTAL rows per kernel launch: a fleet chunk
        # of 16 members x 4000 particles is in the block-160 regime even
        # though each member is a 4000-particle filter (measured +4.5%
        # on config #5), and pick_block honors the per-member divisor
        assert resolve_block_cap(16 * 4000, 0) == 160
        assert pick_block(4000, 160, total_rows=64_000) == 160
        # the auto caps compose with pick_block's divisor rule
        assert pick_block(100_000, resolve_block_cap(100_000, 0)) == 160
        assert pick_block(4000, resolve_block_cap(4000, 0)) == 80

    def test_window_exceeding_t_rejected(self):
        # tiny T: the beam span no longer fits a single circle row
        with pytest.raises(ValueError):
            window_bytes(32, BEAMS_60)


class TestKernelParity:
    def test_random_particles_60_beams(self):
        rng = np.random.default_rng(0)
        got, want = _run_case(rng, BEAMS_60, 64)
        _assert_close(got, want)

    def test_wraparound_bins(self):
        """Headings that put b0 near T (window crosses the wraparound pad)."""
        rng = np.random.default_rng(1)
        t = suggest_theta_bins(BEAMS_60)

        def theta_gen(n):
            # b0 = round(theta*T/2pi)+base mod T near T-1
            return rng.uniform(2 * math.pi - 0.3, 2 * math.pi + 0.3, n)

        got, want = _run_case(rng, BEAMS_60, 48, theta_gen=theta_gen)
        _assert_close(got, want)

    def test_every_residual_shift_exercised(self):
        """A beam set whose residuals span several distinct (monotone)
        shifts: spacing slightly wider than one bin accumulates e = 0..4."""
        rng = np.random.default_rng(2)
        t = suggest_theta_bins(BEAMS_60)
        delta = 2 * math.pi / t
        beams = (np.arange(60) * delta * 1.07 - 2.0).astype(np.float32)
        base, k, e = beam_geometry(beams, t)
        assert k == 1
        assert len(set(e.tolist())) >= 3, "case must exercise >2 shifts"
        got, want = _run_case(rng, beams, 32, t_bins=t)
        _assert_close(got, want)

    def test_non_injective_beams_rejected(self):
        """Non-monotone residuals would merge two beams onto one lane —
        the kernel builder must reject instead of silently miscomputing."""
        t = 79  # one bin per beam step: adjacent beams can collide
        delta = 2 * math.pi / t
        beams = BEAMS_60.copy()
        beams[7] += 1.4 * delta  # push beam 7 onto beam 8's bin
        beams[8] -= 0.4 * delta
        base, k, e = beam_geometry(beams, t)
        q = np.arange(60) + e
        if len(set(q.tolist())) == 60:
            pytest.skip("perturbation did not create a collision")
        with pytest.raises(ValueError):
            _build(beams, 16, height=8, width=8, t_bins=t)

    def test_out_of_map_particles(self):
        rng = np.random.default_rng(3)

        def xy_gen(n):
            x = rng.uniform(-5.0, 5.0, n)  # map is only 1.6 m wide
            y = rng.uniform(-5.0, 5.0, n)
            return x, y

        got, want = _run_case(rng, BEAMS_60, 48, xy_gen=xy_gen)
        oob = got == -1e4
        assert oob.any(), "case must include out-of-map particles"
        _assert_close(got, want)

    def test_block_boundary_and_padding(self):
        """N spanning multiple blocks; identical particles across a block
        boundary must produce identical log-weights."""
        rng = np.random.default_rng(4)
        n, block = 48, 16
        query, info, t, stride = _build(BEAMS_60, n, height=24, width=32,
                                        block=block)
        lut2d = _make_lut(rng, 24 * 32, stride, t, 120)
        one = np.array([0.7, 0.6, 1.1], np.float32)
        particles = np.tile(one, (n, 1))
        particles[:block] = np.array([0.3, 0.2, -0.4], np.float32)
        obs = rng.uniform(0, 120, 60).astype(np.float32)
        got = np.asarray(
            query(jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
                  jnp.asarray(obs))
        )
        assert np.allclose(got[block:], got[block], atol=0), (
            "same particle in different blocks must agree exactly"
        )
        assert not np.isclose(got[0], got[block])

    def test_heavy_duplicate_windows(self):
        """Converged-cloud shape: most particles share one cell+heading
        (so most DMA windows are identical), in shuffled order, spanning
        blocks — oracle parity must hold exactly."""
        rng = np.random.default_rng(6)
        n, height, width = 64, 24, 32
        query, info, t, stride = _build(BEAMS_60, n, height=height,
                                        width=width, block=16)
        lut2d = _make_lut(rng, height * width, stride, t, 120)
        particles = np.empty((n, 3), np.float32)
        # keep poses OFF cell-boundary multiples of the 0.05 resolution:
        # there f32 (kernel) and f64 (oracle) floor to different cells
        particles[:] = np.array([0.71, 0.63, 1.1], np.float32)
        particles[5] = [0.32, 0.21, -0.4]
        particles[23] = [1.12, 0.94, 2.0]
        particles[24] = [1.12, 0.94, 2.0]
        particles[49] = [0.22, 1.03, 0.1]
        rng.shuffle(particles)
        obs = rng.uniform(0, 120, 60).astype(np.float32)
        got = np.asarray(
            query(jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
                  jnp.asarray(obs))
        )
        want = _oracle_logw(
            lut2d, particles.astype(np.float64), obs.astype(np.float64),
            BEAMS_60, t, 120, height=height, width=width,
            resolution=0.05, origin_x=0.0, origin_y=0.0,
        )
        _assert_close(got, want)

    def test_1080_beam_headline_geometry(self):
        rng = np.random.default_rng(5)
        r = 1080
        beams = np.linspace(-0.75 * np.pi, 0.75 * np.pi, r).astype(np.float32)
        got, want = _run_case(rng, beams, 16, height=16, width=16)
        _assert_close(got, want, tol=5e-3)  # 18x more beams summed

    def test_row_stride_too_small_rejected(self):
        t = suggest_theta_bins(BEAMS_60)
        need = required_row_stride(t, BEAMS_60)
        with pytest.raises(ValueError):
            build_lut_query_fn(
                t, BEAMS_60, 16, height=8, width=8, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=100,
                row_stride=need - SUB,
                z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
                sigma_hit=SIGMA, inv_squash=INV_SQUASH, interpret=True,
            )

    def test_bad_block_divisor_rejected(self):
        t = suggest_theta_bins(BEAMS_60)
        with pytest.raises(ValueError):
            build_lut_query_fn(
                t, BEAMS_60, 17, height=8, width=8, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=100,
                row_stride=required_row_stride(t, BEAMS_60),
                z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
                sigma_hit=SIGMA, inv_squash=INV_SQUASH,
                block=16, interpret=True,
            )


class TestDedupKernel:
    """Unique-window DMA dedup (``dedup_slots``): the sorted fixed-slot
    kernel must be BIT-identical to the standard kernel — same windows,
    same rotation, same model math, only the DMA schedule differs — and
    blocks with more distinct windows than slots must fall back to the
    standard kernel inside the jitted step."""

    def _both(self, rng, particles, beams=BEAMS_60, height=24, width=32,
              block=16, dedup_slots=8, max_range_px=120):
        n = len(particles)
        # the dedup kernel reduces over the full window; pin the standard
        # reference to the same reduce order (compact_beams changes only
        # the beams-sum order, pinned by TestKernelParity)
        q_std, _, t, stride = _build(beams, n, height=height, width=width,
                                     block=block, max_range_px=max_range_px,
                                     compact_beams=False)
        q_dd, info, _, _ = _build(beams, n, height=height, width=width,
                                  block=block, dedup_slots=dedup_slots,
                                  max_range_px=max_range_px)
        assert info["dedup_slots"] == min(dedup_slots, block)
        lut2d = _make_lut(rng, height * width, stride, t, max_range_px)
        obs = rng.uniform(0, max_range_px, len(beams)).astype(np.float32)
        lut_flat = jnp.asarray(lut2d.reshape(-1))
        std = np.asarray(q_std(lut_flat, jnp.asarray(particles),
                               jnp.asarray(obs)))
        dd = np.asarray(q_dd(lut_flat, jnp.asarray(particles),
                             jnp.asarray(obs)))
        want = _oracle_logw(
            lut2d, particles.astype(np.float64), obs.astype(np.float64),
            beams, t, max_range_px, height=height, width=width,
            resolution=0.05, origin_x=0.0, origin_y=0.0,
        )
        return std, dd, want

    def test_converged_cloud_takes_dedup_branch_bit_identical(self):
        """A few distinct poses per block (<= slots): the dedup branch runs
        and must agree with the standard kernel bit for bit."""
        rng = np.random.default_rng(20)
        n = 64
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4], [1.12, 0.94, 2.0]],
            np.float32,
        )
        particles = distinct[rng.integers(0, 3, n)]
        std, dd, want = self._both(rng, particles)
        np.testing.assert_array_equal(std, dd)
        _assert_close(dd, want)

    def test_overflow_falls_back_to_standard(self):
        """Every particle in its own cell with its own heading: > slots
        distinct windows per block, so the cond takes the standard branch
        — results still exact vs the oracle."""
        rng = np.random.default_rng(21)
        n, width = 64, 32
        x = (np.arange(n) % width) * 0.05 + 0.026
        y = (np.arange(n) // width) * 0.05 + 0.026
        theta = rng.uniform(-math.pi, math.pi, n)
        particles = np.stack([x, y, theta], 1).astype(np.float32)
        std, dd, want = self._both(rng, particles)
        np.testing.assert_array_equal(std, dd)
        _assert_close(dd, want)

    def test_mixed_dup_unique_and_oob(self):
        """Shuffled mix of heavy duplicates, singletons and out-of-map
        particles across block boundaries."""
        rng = np.random.default_rng(22)
        n = 48
        particles = np.tile(
            np.array([0.71, 0.63, 1.1], np.float32), (n, 1)
        )
        particles[3] = [0.32, 0.21, -0.4]
        particles[17] = [-3.0, 0.5, 0.0]  # out of map
        particles[31] = [1.12, 0.94, 2.0]
        rng.shuffle(particles)
        std, dd, want = self._both(rng, particles, dedup_slots=4)
        np.testing.assert_array_equal(std, dd)
        assert (dd == -1e4).sum() == 1
        _assert_close(dd, want)

    def test_u16_long_range_dedup(self):
        rng = np.random.default_rng(23)
        n = 32
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4]], np.float32
        )
        particles = distinct[rng.integers(0, 2, n)]
        std, dd, want = self._both(rng, particles, max_range_px=600)
        np.testing.assert_array_equal(std, dd)
        _assert_close(dd, want)

    def test_fleet_members_rejected(self):
        t = suggest_theta_bins(BEAMS_60)
        with pytest.raises(ValueError, match="single member"):
            build_lut_query_fn(
                t, BEAMS_60, 32, height=8, width=8, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=100,
                row_stride=required_row_stride(t, BEAMS_60),
                z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
                sigma_hit=SIGMA, inv_squash=INV_SQUASH,
                block=16, interpret=True, num_members=2, dedup_slots=8,
            )

    def test_auto_resolution_thresholds(self):
        from monte_carlo_localization_tpu.config import MCLConfig
        from monte_carlo_localization_tpu.filter.core import (
            _resolve_dedup_slots,
        )

        # auto (-1) resolves to OFF everywhere: the dedup kernel is a
        # measured negative result on v5e (dynamic VMEM index lookup,
        # ~10us/particle — see MCLConfig.pallas_dedup_slots / PERF.md).
        auto = MCLConfig()
        assert _resolve_dedup_slots(auto, 4000, 1) == 0
        assert _resolve_dedup_slots(auto, 100_000, 1) == 0
        assert _resolve_dedup_slots(auto, 100_000, 4) == 0  # fleet: off
        off = MCLConfig(pallas_dedup_slots=0)
        assert _resolve_dedup_slots(off, 100_000, 1) == 0
        forced = MCLConfig(pallas_dedup_slots=16)
        assert _resolve_dedup_slots(forced, 256, 1) == 16
        forced_fleet = MCLConfig(pallas_dedup_slots=16)
        assert _resolve_dedup_slots(forced_fleet, 256, 4) == 0  # fleet: off

    def test_filter_end_to_end_with_dedup(self, clutter_map, beams60,
                                          make_scan):
        """A ParticleFilter with forced dedup slots localizes, and its
        log-quality matches the same filter without dedup."""
        from monte_carlo_localization_tpu.config import MCLConfig
        from monte_carlo_localization_tpu.filter import ParticleFilter

        pose = np.array([10.0, 10.0, 0.5], np.float32)
        scan = make_scan(clutter_map, pose, beams60)
        ests = []
        for slots in (0, 4):
            pf = ParticleFilter(
                clutter_map,
                MCLConfig(
                    max_particles=128, raycast_method="lut_pallas",
                    pallas_dedup_slots=slots, seed=7,
                ),
            )
            pf.set_beam_angles(beams60)
            state = pf.init_pose(pose, seed=1)
            state, est = pf.step(state, np.zeros(3, np.float32), scan)
            ests.append(np.asarray(est))
        np.testing.assert_allclose(ests[0], ests[1], atol=1e-5)
        assert np.linalg.norm(ests[1][:2] - pose[:2]) < 0.3


class TestDedupMatmulKernel:
    """The one-hot MXU slot-select dedup variant (``dedup_matmul``) must
    be BIT-identical to the standard kernel — exact integer selection on
    the MXU replaces the dynamic VMEM slot index (VERDICT round-2 item
    4); overflow still falls back to the standard kernel."""

    def _both(self, rng, particles, beams=BEAMS_60, height=24, width=32,
              block=16, dedup_slots=8, max_range_px=120, subbin=False):
        n = len(particles)
        q_std, _, t, stride = _build(beams, n, height=height, width=width,
                                     block=block, max_range_px=max_range_px,
                                     compact_beams=False, subbin=subbin)
        q_mm, info, _, _ = _build(beams, n, height=height, width=width,
                                  block=block, dedup_slots=dedup_slots,
                                  max_range_px=max_range_px, subbin=subbin,
                                  dedup_matmul=True)
        assert info["dedup_matmul"] is True
        lut2d = _make_lut(rng, height * width, stride, t, max_range_px)
        obs = rng.uniform(0, max_range_px, len(beams)).astype(np.float32)
        lut_flat = jnp.asarray(lut2d.reshape(-1))
        std = np.asarray(q_std(lut_flat, jnp.asarray(particles),
                               jnp.asarray(obs)))
        mm = np.asarray(q_mm(lut_flat, jnp.asarray(particles),
                             jnp.asarray(obs)))
        return std, mm

    def test_converged_cloud_bit_identical(self):
        rng = np.random.default_rng(40)
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4], [1.12, 0.94, 2.0]],
            np.float32,
        )
        particles = distinct[rng.integers(0, 3, 64)]
        std, mm = self._both(rng, particles)
        np.testing.assert_array_equal(std, mm)

    def test_overflow_falls_back(self):
        rng = np.random.default_rng(41)
        n, width = 64, 32
        x = (np.arange(n) % width) * 0.05 + 0.026
        y = (np.arange(n) // width) * 0.05 + 0.026
        theta = rng.uniform(-math.pi, math.pi, n)
        particles = np.stack([x, y, theta], 1).astype(np.float32)
        std, mm = self._both(rng, particles)
        np.testing.assert_array_equal(std, mm)

    def test_u16_bit_identical(self):
        rng = np.random.default_rng(42)
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4]], np.float32
        )
        particles = distinct[rng.integers(0, 2, 32)]
        std, mm = self._both(rng, particles, max_range_px=600)
        np.testing.assert_array_equal(std, mm)

    def test_subbin_bit_identical(self):
        rng = np.random.default_rng(43)
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4]], np.float32
        )
        particles = distinct[rng.integers(0, 2, 32)]
        std, mm = self._both(rng, particles, subbin=True)
        np.testing.assert_array_equal(std, mm)

    def test_requires_dedup_slots(self):
        with pytest.raises(ValueError, match="dedup_matmul"):
            _build(BEAMS_60, 16, height=8, width=8, dedup_matmul=True)


class TestKernelParityU16:
    """Long-range maps (max_range_px > 254) use a u16 LUT: 256 entries per
    512 B DMA subrow instead of 512. Same oracle, different window math."""

    def test_random_particles_u16(self):
        rng = np.random.default_rng(10)
        got, want = _run_case(rng, BEAMS_60, 64, max_range_px=600)
        _assert_close(got, want)

    def test_wraparound_bins_u16(self):
        rng = np.random.default_rng(11)

        def theta_gen(n):
            return rng.uniform(2 * math.pi - 0.3, 2 * math.pi + 0.3, n)

        got, want = _run_case(rng, BEAMS_60, 48, theta_gen=theta_gen,
                              max_range_px=600)
        _assert_close(got, want)

    def test_1080_beams_u16(self):
        rng = np.random.default_rng(12)
        beams = np.linspace(-0.75 * np.pi, 0.75 * np.pi, 1080).astype(
            np.float32
        )
        got, want = _run_case(rng, beams, 16, height=16, width=16,
                              max_range_px=300)
        _assert_close(got, want, tol=5e-3)

    def test_bad_stride_rejected_u16(self):
        """Too-small and non-256-multiple strides must fail the u16 guards
        (u16 subrows hold 256 entries, so alignment is finer than u8)."""
        t = suggest_theta_bins(BEAMS_60)
        s_u16 = required_row_stride(t, BEAMS_60, itemsize=2)
        assert s_u16 % 256 == 0

        def build(stride):
            return build_lut_query_fn(
                t, BEAMS_60, 16, height=8, width=8, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=600,
                row_stride=stride,
                z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
                sigma_hit=SIGMA, inv_squash=INV_SQUASH,
                interpret=True, lut_dtype=np.uint16,
            )

        with pytest.raises(ValueError):
            build(s_u16 - 256)  # below the required stride
        with pytest.raises(ValueError):
            build(s_u16 + 128)  # not a multiple of the subrow

    def test_long_range_filter_end_to_end(self, beams60, make_scan):
        """A lut_pallas ParticleFilter on a max_range_px>254 map localizes:
        the u16 kernel path is selected automatically and the weighted pose
        lands at the true pose (previously this config raised)."""
        from monte_carlo_localization_tpu.config import MCLConfig
        from monte_carlo_localization_tpu.filter import ParticleFilter
        from monte_carlo_localization_tpu.filter.core import expected_pose
        from monte_carlo_localization_tpu.mapping import random_obstacle_world

        gm = random_obstacle_world(
            height=96, width=96, num_obstacles=12, seed=7,
            resolution=0.05, max_range_meters=20.0,  # 400 px > 254 -> u16
        )
        assert gm.max_range_px > 254
        pose = np.array([2.4, 2.4, 0.5], np.float32)
        scan = make_scan(gm, pose, beams60)
        pf = ParticleFilter(
            gm, MCLConfig(max_particles=256, raycast_method="lut_pallas")
        )
        pf.set_beam_angles(beams60)
        assert np.asarray(pf.grid_map.range_lut).dtype == np.uint16
        state = pf.init_pose(pose, seed=0)
        state, est = pf.step(state, np.zeros(3, np.float32), scan)
        est = np.asarray(est)
        assert np.linalg.norm(est[:2] - pose[:2]) < 0.3, est


class TestFilterIntegration:
    def test_lut_pallas_filter_matches_lut_filter(self, clutter_map, beams60,
                                                  make_scan):
        """End-to-end: a lut_pallas ParticleFilter step's log-weights agree
        with the XLA lut+analytic path within bin-quantization tolerance."""
        from monte_carlo_localization_tpu.config import MCLConfig
        from monte_carlo_localization_tpu.filter import ParticleFilter

        n = 256
        pose = np.array([10.0, 10.0, 0.5], np.float32)
        scan = make_scan(clutter_map, pose, beams60)

        pf = ParticleFilter(
            clutter_map,
            MCLConfig(
                max_particles=n, raycast_method="lut_pallas",
                z_hit=Z_HIT, z_short=Z_SHORT, z_max=Z_MAX, z_rand=Z_RAND,
                sigma_hit=SIGMA, squash_factor=1.0 / INV_SQUASH,
            ),
        )
        pf.set_beam_angles(beams60)

        from monte_carlo_localization_tpu.ops.raycast import lut_expected_px

        state = pf.init_pose(pose, seed=0)
        particles = np.asarray(state.particles)
        obs_px = pf.sensor.to_pixel_index(jnp.asarray(scan)).astype(
            jnp.float32
        )

        # XLA twin on the SAME padded LUT and theta bins
        d_px = lut_expected_px(
            pf.grid_map, jnp.asarray(particles), jnp.asarray(beams60)
        )
        logp = pf.sensor.log_prob_analytic(obs_px[None, :], d_px)
        want = np.asarray(pf.sensor.inv_squash_factor * logp.sum(axis=1))

        # the kernel via the filter's own query closure
        gm = pf.grid_map
        got = np.asarray(
            pf._pallas_query(gm.range_lut, jnp.asarray(particles), obs_px)
        )

        # (a) EXACT against the same-decomposition oracle on the real map
        # LUT (pins the DMA windows / rotation / lane layout end-to-end)
        lut2d = np.asarray(gm.range_lut).reshape(-1, gm.lut_row_stride)
        exact = _oracle_logw(
            lut2d, particles.astype(np.float64),
            np.asarray(obs_px, np.float64), np.asarray(beams60),
            gm.lut_theta_bins, gm.max_range_px,
            height=gm.height, width=gm.width, resolution=gm.resolution,
            origin_x=float(gm.origin_x), origin_y=float(gm.origin_y),
            subbin=pf.config.pallas_subbin,  # default OFF (measured negative; opt-in)
        )
        np.testing.assert_allclose(got, exact, rtol=0, atol=1e-3)

        # (b) against the XLA lut twin the paths quantize the ray angle
        # differently (round(a+b) vs round(a)+round(b): one theta bin),
        # which near range discontinuities legitimately moves individual
        # log-weights — so compare ranking, not values
        c = np.corrcoef(got, want)[0, 1]
        assert c > 0.9, f"kernel vs XLA lut path corr {c}"
        # and the two paths' weighted pose estimates must agree closely
        from monte_carlo_localization_tpu.filter.core import expected_pose

        # (the schemes legitimately disagree per particle near range
        # discontinuities, so compare both to the ground-truth pose the
        # scan was synthesized at rather than tightly to each other)
        pa = np.asarray(expected_pose(jnp.asarray(particles), jnp.asarray(got)))
        pb = np.asarray(expected_pose(jnp.asarray(particles), jnp.asarray(want)))
        assert np.linalg.norm(pa[:2] - pose[:2]) < 0.25, pa
        assert np.linalg.norm(pb[:2] - pose[:2]) < 0.25, pb


class TestCompactBeams:
    """The compact-beam MXU selection path (r <= 128) must agree with the
    full-window reduce to f32 round-off: identical per-beam values, only
    the beams-sum order differs."""

    def test_compact_matches_full_window(self):
        rng = np.random.default_rng(21)
        n = 64
        particles = np.stack([
            rng.uniform(0.11, 1.49, n), rng.uniform(0.11, 1.09, n),
            rng.uniform(-np.pi, np.pi, n),
        ], 1).astype(np.float32)
        q_full, _, t, stride = _build(BEAMS_60, n, height=24, width=32,
                                      compact_beams=False)
        q_comp, _, _, _ = _build(BEAMS_60, n, height=24, width=32,
                                 compact_beams=True)
        lut2d = _make_lut(rng, 24 * 32, stride, t, 120)
        obs = rng.uniform(0, 120, len(BEAMS_60)).astype(np.float32)
        lut_flat = jnp.asarray(lut2d.reshape(-1))
        full = np.asarray(q_full(lut_flat, jnp.asarray(particles),
                                 jnp.asarray(obs)))
        comp = np.asarray(q_comp(lut_flat, jnp.asarray(particles),
                                 jnp.asarray(obs)))
        np.testing.assert_allclose(comp, full, rtol=2e-6, atol=2e-4)

    def test_compact_rejects_wide_beam_sets(self):
        import pytest

        beams = np.linspace(-2.35, 2.35, 256).astype(np.float32)
        with pytest.raises(ValueError):
            _build(beams, 16, height=24, width=32, compact_beams=True)


class TestSubbin:
    """Sub-bin angular refinement: the heading's fractional theta-bin
    position lerps each beam between its bin and the +1 neighbor lane
    (VERDICT round-2 item 2). Pinned against the same-decomposition numpy
    oracle with the floor+frac scheme, across the window-wrap edge, in
    u16, and through the compact-beam MXU path."""

    def test_random_particles_subbin(self):
        rng = np.random.default_rng(30)
        got, want = _run_case(rng, BEAMS_60, 64, subbin=True)
        _assert_close(got, want)

    def test_wraparound_bins_subbin(self):
        rng = np.random.default_rng(31)

        def theta_gen(n):
            return rng.uniform(2 * math.pi - 0.3, 2 * math.pi + 0.3, n)

        got, want = _run_case(rng, BEAMS_60, 48, theta_gen=theta_gen,
                              subbin=True)
        _assert_close(got, want)

    def test_u16_subbin(self):
        rng = np.random.default_rng(32)
        got, want = _run_case(rng, BEAMS_60, 32, max_range_px=600,
                              subbin=True)
        _assert_close(got, want)

    def test_1080_beams_subbin(self):
        rng = np.random.default_rng(33)
        beams = np.linspace(-0.75 * np.pi, 0.75 * np.pi, 1080).astype(
            np.float32
        )
        got, want = _run_case(rng, beams, 16, height=16, width=16,
                              subbin=True)
        _assert_close(got, want, tol=5e-3)

    def test_compact_matches_full_window_subbin(self):
        """Compact path (lerped windows through the HIGHEST-precision
        selection matmul) vs the full-window lerped reduce."""
        rng = np.random.default_rng(34)
        n = 64
        particles = np.stack([
            rng.uniform(0.11, 1.49, n), rng.uniform(0.11, 1.09, n),
            rng.uniform(-np.pi, np.pi, n),
        ], 1).astype(np.float32)
        q_full, _, t, stride = _build(BEAMS_60, n, height=24, width=32,
                                      compact_beams=False, subbin=True)
        q_comp, _, _, _ = _build(BEAMS_60, n, height=24, width=32,
                                 compact_beams=True, subbin=True)
        lut2d = _make_lut(rng, 24 * 32, stride, t, 120)
        obs = rng.uniform(0, 120, len(BEAMS_60)).astype(np.float32)
        lut_flat = jnp.asarray(lut2d.reshape(-1))
        full = np.asarray(q_full(lut_flat, jnp.asarray(particles),
                                 jnp.asarray(obs)))
        comp = np.asarray(q_comp(lut_flat, jnp.asarray(particles),
                                 jnp.asarray(obs)))
        np.testing.assert_allclose(comp, full, rtol=2e-6, atol=2e-4)

    def test_dedup_bit_identical_subbin(self):
        """The dedup kernel under subbin must stay bit-identical to the
        standard kernel (same windows, same lerp, only the DMA schedule
        differs)."""
        rng = np.random.default_rng(35)
        n = 64
        distinct = np.array(
            [[0.71, 0.63, 1.1], [0.32, 0.21, -0.4], [1.12, 0.94, 2.0]],
            np.float32,
        )
        particles = distinct[rng.integers(0, 3, n)]
        q_std, _, t, stride = _build(BEAMS_60, n, height=24, width=32,
                                     compact_beams=False, subbin=True)
        q_dd, _, _, _ = _build(BEAMS_60, n, height=24, width=32,
                               dedup_slots=8, subbin=True)
        lut2d = _make_lut(rng, 24 * 32, stride, t, 120)
        obs = rng.uniform(0, 120, 60).astype(np.float32)
        lut_flat = jnp.asarray(lut2d.reshape(-1))
        std = np.asarray(q_std(lut_flat, jnp.asarray(particles),
                               jnp.asarray(obs)))
        dd = np.asarray(q_dd(lut_flat, jnp.asarray(particles),
                             jnp.asarray(obs)))
        np.testing.assert_array_equal(std, dd)

    def test_subbin_beats_nearest_on_smooth_lut(self):
        """On a LUT whose rows vary smoothly with angle (real ranges do,
        steeply at grazing incidence), the floor+lerp decomposition must
        track the continuous range function much better than
        round-to-nearest. Pure-numpy check of the scheme the kernel
        implements (kernel == this decomposition is pinned by the parity
        tests above)."""
        rng = np.random.default_rng(36)
        n, height, width = 256, 8, 8
        t = suggest_theta_bins(BEAMS_60)
        stride = required_row_stride(t, BEAMS_60)
        # smooth periodic "range vs angle" per cell; frequency 8 gives
        # ~3.5 px/bin slope so the heading-quantization error dominates
        # the u8 value rounding (as it does at grazing angles on a map)
        phases = rng.uniform(0, 2 * np.pi, height * width)
        bb = 2 * np.pi * np.arange(t) / t
        cont = 120.0 + 100.0 * np.sin(8.0 * bb[None, :] + phases[:, None])
        base_lut = np.round(cont).astype(np.uint8)
        reps = -(-stride // t)
        lut2d = np.tile(base_lut, (1, reps))[:, :stride].copy()

        particles = np.stack([
            rng.uniform(0.02, width * 0.05 - 0.02, n),
            rng.uniform(0.02, height * 0.05 - 0.02, n),
            rng.uniform(-np.pi, np.pi, n),
        ], 1).astype(np.float32)

        base_g, k, e = beam_geometry(BEAMS_60, t)
        gx = (particles[:, 0] / 0.05).astype(np.int64)
        gy = (particles[:, 1] / 0.05).astype(np.int64)
        cell = gy * width + gx
        # continuous truth: the quantized-bin grid samples cont at bin
        # angles; beam j's true (unquantized-heading) bin position
        bins_f64 = (
            particles[:, 2].astype(np.float64) * (t / (2 * math.pi))
        )[:, None] + (base_g + k * np.arange(60) + e)[None, :]
        true_d = 120.0 + 100.0 * np.sin(
            8.0 * (2 * np.pi / t) * bins_f64 + phases[cell][:, None]
        )

        errs = {}
        for sb in (False, True):
            bpos32 = (
                particles[:, 2].astype(np.float32)
                * np.float32(t / (2 * math.pi))
            )
            if sb:
                b0 = np.floor(bpos32).astype(np.int64)
                frac = (bpos32 - np.floor(bpos32)).astype(np.float64)
            else:
                b0 = np.round(
                    particles[:, 2].astype(np.float64) * (t / (2 * math.pi))
                ).astype(np.int64)
            b0 = (b0 + base_g) % t
            bins = b0[:, None] + k * np.arange(60)[None, :] + e[None, :]
            d = lut2d[cell[:, None], bins].astype(np.float64)
            if sb:
                d1 = lut2d[cell[:, None], bins + 1].astype(np.float64)
                d = d + frac[:, None] * (d1 - d)
            errs[sb] = float(np.sqrt(np.mean((d - true_d) ** 2)))
        # nearest-bin pays the coherent half-bin heading error (~1 px RMS
        # at this slope); lerp leaves only value rounding (~0.3 px RMS)
        assert errs[True] < 0.5 * errs[False], errs

    def test_info_reports_subbin(self):
        _, info, _, _ = _build(BEAMS_60, 16, height=8, width=8, subbin=True)
        assert info["subbin"] is True
        _, info, _, _ = _build(BEAMS_60, 16, height=8, width=8)
        assert info["subbin"] is False


class TestChunkedLaunch:
    """Clouds past the SMEM scalar-prefetch budget split into multiple
    launches (the 1M-particle scale line: (N,) y0/rem prefetch operands
    at 8 B/row overflow v5e's 1 MiB SMEM near ~128k rows). The chunked
    query must be BITWISE identical to the single-launch kernel; the
    budget is shrunk via monkeypatch so chunking triggers at test scale."""

    def _inputs(self, rng, n, height, width, stride, t, max_range_px=120):
        lut2d = _make_lut(rng, height * width, stride, t, max_range_px)
        res = 0.05
        x = rng.uniform(0.01, width * res - 0.01, n)
        y = rng.uniform(0.01, height * res - 0.01, n)
        th = rng.uniform(-2 * math.pi, 2 * math.pi, n)
        particles = np.stack([x, y, th], 1).astype(np.float32)
        return lut2d, particles

    def test_chunked_bitwise_matches_single_launch(self, monkeypatch):
        import monte_carlo_localization_tpu.ops.pallas_lut as mod

        rng = np.random.default_rng(11)
        n = 96
        q_ref, _, t, stride = _build(BEAMS_60, n, height=24, width=32)
        # 32-row budget -> launches of 32, 32, 32 (no tail)
        monkeypatch.setattr(mod, "PREFETCH_SMEM_BUDGET", 32 * 8)
        q_chunk, _, t2, stride2 = _build(BEAMS_60, n, height=24, width=32)
        assert (t2, stride2) == (t, stride)
        lut2d, particles = self._inputs(rng, n, 24, 32, stride, t)
        obs = rng.uniform(0, 120, 60).astype(np.float32)
        a = np.asarray(q_ref(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        b = np.asarray(q_chunk(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        np.testing.assert_array_equal(a, b)

    def test_tail_chunk_and_full_window_path(self, monkeypatch):
        import monte_carlo_localization_tpu.ops.pallas_lut as mod

        rng = np.random.default_rng(12)
        n = 80  # 40-row budget -> launch 32 + 32 + TAIL 16
        q_ref, _, t, stride = _build(
            BEAMS_60, n, height=24, width=32, compact_beams=False
        )
        monkeypatch.setattr(mod, "PREFETCH_SMEM_BUDGET", 40 * 8)
        q_chunk, _, _, _ = _build(
            BEAMS_60, n, height=24, width=32, compact_beams=False
        )
        lut2d, particles = self._inputs(rng, n, 24, 32, stride, t)
        obs = rng.uniform(0, 120, 60).astype(np.float32)
        a = np.asarray(q_ref(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        b = np.asarray(q_chunk(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        np.testing.assert_array_equal(a, b)
        # and the chunked result still matches the f64 oracle
        want = _oracle_logw(
            lut2d, particles.astype(np.float64), obs.astype(np.float64),
            BEAMS_60, t, 120, height=24, width=32, resolution=0.05,
            origin_x=0.0, origin_y=0.0,
        )
        _assert_close(b, want)

    def test_fleet_members_chunk_on_member_boundaries(self, monkeypatch):
        import monte_carlo_localization_tpu.ops.pallas_lut as mod
        from monte_carlo_localization_tpu.ops.pallas_lut import (
            build_lut_query_fn as _bq,
        )

        rng = np.random.default_rng(13)
        n, members = 64, 4  # npm=16 -> 2 members (32 rows) per launch
        t = suggest_theta_bins(BEAMS_60)
        stride = required_row_stride(t, BEAMS_60, itemsize=1)

        def build():
            q, _ = _bq(
                t, BEAMS_60, n, height=24, width=32, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=120,
                row_stride=stride, z_hit=Z_HIT, z_short=Z_SHORT,
                z_max=Z_MAX, z_rand=Z_RAND, sigma_hit=SIGMA,
                inv_squash=INV_SQUASH, block=16, interpret=True,
                num_members=members,
            )
            return q

        q_ref = build()
        monkeypatch.setattr(mod, "PREFETCH_SMEM_BUDGET", 32 * 8)
        q_chunk = build()
        lut2d, particles = self._inputs(rng, n, 24, 32, stride, t)
        obs = rng.uniform(0, 120, (members, 60)).astype(np.float32)
        a = np.asarray(q_ref(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        b = np.asarray(q_chunk(
            jnp.asarray(lut2d.reshape(-1)), jnp.asarray(particles),
            jnp.asarray(obs)))
        np.testing.assert_array_equal(a, b)

    def test_oversized_member_rejected(self, monkeypatch):
        import monte_carlo_localization_tpu.ops.pallas_lut as mod

        monkeypatch.setattr(mod, "PREFETCH_SMEM_BUDGET", 16 * 8)
        t = suggest_theta_bins(BEAMS_60)
        stride = required_row_stride(t, BEAMS_60, itemsize=1)
        with pytest.raises(ValueError, match="per-member particle count"):
            mod.build_lut_query_fn(
                t, BEAMS_60, 64, height=24, width=32, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=120,
                row_stride=stride, z_hit=Z_HIT, z_short=Z_SHORT,
                z_max=Z_MAX, z_rand=Z_RAND, sigma_hit=SIGMA,
                inv_squash=INV_SQUASH, block=16, interpret=True,
                num_members=2,  # npm=32 > 16-row budget
            )

    def test_dedup_past_budget_rejected(self, monkeypatch):
        import monte_carlo_localization_tpu.ops.pallas_lut as mod

        monkeypatch.setattr(mod, "PREFETCH_SMEM_BUDGET", 32 * 8)
        t = suggest_theta_bins(BEAMS_60)
        stride = required_row_stride(t, BEAMS_60, itemsize=1)
        with pytest.raises(ValueError, match="dedup_slots is unsupported"):
            mod.build_lut_query_fn(
                t, BEAMS_60, 64, height=24, width=32, resolution=0.05,
                origin_x=0.0, origin_y=0.0, max_range_px=120,
                row_stride=stride, z_hit=Z_HIT, z_short=Z_SHORT,
                z_max=Z_MAX, z_rand=Z_RAND, sigma_hit=SIGMA,
                inv_squash=INV_SQUASH, block=16, interpret=True,
                dedup_slots=8,
            )
