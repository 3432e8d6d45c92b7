import numpy as np
import pytest

import jax.numpy as jnp

from monte_carlo_localization_tpu.models.sensor import SensorModel, build_sensor_table


def reference_table(max_range_px, z_hit, z_short, z_max, z_rand, sigma_hit):
    """Literal transcription of reference src/particle_filter.cpp:248-287."""
    w = max_range_px + 1
    table = np.zeros((w, w))
    for d in range(w):
        norm = 0.0
        for r in range(w):
            prob = 0.0
            z = float(r - d)
            prob += (
                z_hit
                * np.exp(-(z * z) / (2.0 * sigma_hit**2))
                / (sigma_hit * np.sqrt(2.0 * np.pi))
            )
            if r < d:
                prob += 2.0 * z_short * (d - r) / float(d)
            if r == max_range_px:
                prob += z_max
            if r < max_range_px:
                prob += z_rand / max_range_px
            norm += prob
            table[r, d] = prob
        if norm > 0:
            table[:, d] /= norm
    return table


@pytest.mark.parametrize("max_range_px", [30, 240])
def test_table_matches_reference_loop(max_range_px):
    params = dict(z_hit=0.8, z_short=0.01, z_max=0.07, z_rand=0.12, sigma_hit=8.0)
    want = reference_table(max_range_px, **params)
    got = build_sensor_table(max_range_px, **params)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_table_columns_normalized():
    t = build_sensor_table(100)
    np.testing.assert_allclose(t.sum(axis=0), 1.0, atol=1e-5)
    assert (t >= 0).all()


def test_table_peak_at_expected():
    t = build_sensor_table(240)
    # Excluding the z_max spike at r=240 (which at the reference defaults
    # exceeds the Gaussian peak density), the most likely observation for
    # interior d is near d itself.
    for d in (50, 120, 200):
        assert abs(int(np.argmax(t[:240, d])) - d) <= 1


def test_log_likelihood_matches_direct_product():
    sm = SensorModel.create(max_range_px=100, resolution=0.05, squash_factor=2.2)
    table = np.exp(np.asarray(sm.log_table))
    rng = np.random.default_rng(0)
    obs = rng.uniform(0, 5.0, 20).astype(np.float32)
    expected = rng.uniform(0, 5.0, (7, 20)).astype(np.float32)
    got = np.asarray(sm.log_likelihood(jnp.asarray(obs), jnp.asarray(expected)))
    # direct product as the reference computes it (:564-579)
    obs_px = np.clip(np.round(np.clip(obs / 0.05, 0, 100)), 0, 100).astype(int)
    exp_px = np.clip(np.round(np.clip(expected / 0.05, 0, 100)), 0, 100).astype(int)
    for i in range(7):
        w = 1.0
        for j in range(20):
            w *= table[obs_px[j], exp_px[i, j]]
        want = w ** (1 / 2.2)
        assert np.exp(got[i]) == pytest.approx(want, rel=1e-3)


def test_pixel_clipping_and_nan():
    sm = SensorModel.create(max_range_px=50, resolution=0.1)
    r = jnp.asarray([np.nan, np.inf, -np.inf, -1.0, 100.0, 2.0], dtype=jnp.float32)
    idx = np.asarray(sm.to_pixel_index(r))
    assert idx.tolist() == [50, 50, 0, 0, 50, 20]


def test_1080_beams_no_underflow():
    """At 1080 beams the reference's linear-space product would underflow
    f32; log-space must stay finite."""
    sm = SensorModel.create(max_range_px=240, resolution=0.05)
    rng = np.random.default_rng(1)
    obs = rng.uniform(0, 12.0, 1080).astype(np.float32)
    expected = rng.uniform(0, 12.0, (4, 1080)).astype(np.float32)
    ll = np.asarray(sm.log_likelihood(jnp.asarray(obs), jnp.asarray(expected)))
    assert np.isfinite(ll).all()
    # and the ordering survives softmax normalization
    w = np.exp(ll - ll.max())
    assert w.max() == 1.0
