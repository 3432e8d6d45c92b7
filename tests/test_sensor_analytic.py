import numpy as np
import pytest

import jax.numpy as jnp

from monte_carlo_localization_tpu.models.sensor import SensorModel


@pytest.mark.parametrize(
    "params",
    [
        dict(),  # reference defaults
        dict(z_hit=0.5, z_short=0.2, z_max=0.2, z_rand=0.1, sigma_hit=3.0),
        dict(z_hit=0.95, z_short=0.0, z_max=0.01, z_rand=0.04, sigma_hit=15.0),
    ],
)
def test_analytic_matches_table_full_grid(params):
    sm = SensorModel.create(max_range_px=120, resolution=0.05, **params)
    r = jnp.arange(121, dtype=jnp.float32)
    d = jnp.arange(121, dtype=jnp.float32)
    R, D = jnp.meshgrid(r, d, indexing="ij")
    la = np.asarray(sm.log_prob_analytic(R, D))
    lt = np.asarray(sm.log_table)
    assert np.abs(la - lt).max() < 2e-3


def test_log_likelihood_modes_agree():
    sm = SensorModel.create(max_range_px=240, resolution=0.05)
    rng = np.random.default_rng(0)
    obs = rng.uniform(0, 13.0, 200).astype(np.float32)
    expected = rng.uniform(0, 13.0, (16, 200)).astype(np.float32)
    lt = np.asarray(sm.log_likelihood(jnp.asarray(obs), jnp.asarray(expected), mode="table"))
    la = np.asarray(sm.log_likelihood(jnp.asarray(obs), jnp.asarray(expected), mode="analytic"))
    # after softmax normalization the weights must be nearly identical
    wt = np.exp(lt - lt.max())
    wa = np.exp(la - la.max())
    np.testing.assert_allclose(wa / wa.sum(), wt / wt.sum(), atol=1e-3)


def test_unknown_mode():
    sm = SensorModel.create(max_range_px=50, resolution=0.1)
    with pytest.raises(ValueError):
        sm.log_likelihood(jnp.zeros(3), jnp.zeros((2, 3)), mode="bogus")


def test_analytic_nan_inf_inputs():
    sm = SensorModel.create(max_range_px=240, resolution=0.05)
    obs = jnp.asarray([np.nan, np.inf, 2.0], dtype=jnp.float32)
    expected = jnp.asarray([[1.0, 2.0, 3.0]], dtype=jnp.float32)
    ll = np.asarray(sm.log_likelihood(obs, expected, mode="analytic"))
    assert np.isfinite(ll).all()
