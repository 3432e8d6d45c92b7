import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monte_carlo_localization_tpu.ops.resample import (
    multinomial_resample_indices,
    resample_indices,
    systematic_resample_indices,
)


def _counts(idx, n):
    return np.bincount(np.asarray(idx), minlength=n)


def test_multinomial_unbiased():
    n = 5000
    w = np.array([0.5, 0.3, 0.15, 0.05] + [0.0] * 0)
    logw = jnp.log(jnp.asarray(w))
    idx = multinomial_resample_indices(jax.random.key(0), logw, num_samples=n)
    freq = _counts(idx, 4) / n
    np.testing.assert_allclose(freq, w, atol=0.02)


def test_systematic_unbiased_and_low_variance():
    n = 4000
    w = np.array([0.5, 0.3, 0.15, 0.05])
    logw = jnp.log(jnp.asarray(w))
    idx = systematic_resample_indices(jax.random.key(1), logw, num_samples=n)
    freq = _counts(idx, 4) / n
    # systematic: counts are within 1 of n*w_i deterministically
    np.testing.assert_allclose(freq, w, atol=1.5 / n)


def test_systematic_variance_below_multinomial():
    n = 1000
    w = np.ones(n) / n
    logw = jnp.zeros(n)
    # unique-ancestor count: systematic keeps ~all, multinomial ~63%
    sys_idx = systematic_resample_indices(jax.random.key(2), logw)
    mul_idx = multinomial_resample_indices(jax.random.key(2), logw)
    assert len(np.unique(np.asarray(sys_idx))) == n
    assert len(np.unique(np.asarray(mul_idx))) < 0.75 * n


def test_degenerate_single_winner():
    logw = jnp.asarray([-1e9, 0.0, -1e9, -1e9])
    for method in ("systematic", "multinomial"):
        idx = resample_indices(jax.random.key(3), logw, method=method)
        assert np.all(np.asarray(idx) == 1), method


def test_resample_different_sample_count():
    logw = jnp.zeros(10)
    idx = systematic_resample_indices(jax.random.key(4), logw, num_samples=25)
    assert idx.shape == (25,)
    assert np.asarray(idx).max() < 10


def _searchsorted_oracle(key, logw, m):
    """The textbook inversion the production scatter+cummax form must
    match bit-for-bit (same key -> same u0, same f32 math)."""
    n = logw.shape[0]
    w = jax.nn.softmax(logw)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    positions = (jnp.arange(m, dtype=cdf.dtype) + u0) / m
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, n - 1).astype(jnp.int32)


def test_systematic_matches_searchsorted_oracle():
    rng = np.random.default_rng(7)
    for n, m in [(1, 1), (2, 2), (7, 7), (10, 25), (25, 10), (1000, 1000),
                 (4096, 4096)]:
        for trial in range(5):
            logw = jnp.asarray(
                rng.standard_normal(n).astype(np.float32)
                * rng.uniform(0.1, 8.0)
            )
            key = jax.random.key(n * 100 + trial)
            got = systematic_resample_indices(key, logw, num_samples=m)
            want = _searchsorted_oracle(key, logw, m)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want), err_msg=f"n={n} m={m}"
            )


def test_windowed_inversion_matches_oracle():
    """The sharded filter inverts the global CDF one output-slot window per
    shard (ops/resample.systematic_invert_cdf_window); stitching every
    shard's window together must reproduce the full searchsorted oracle."""
    from monte_carlo_localization_tpu.ops.resample import (
        systematic_invert_cdf_window,
    )

    rng = np.random.default_rng(11)
    for n_total, n_shards in [(64, 8), (100, 4), (96, 1), (8, 8)]:
        n_local = n_total // n_shards
        for trial in range(5):
            logw = jnp.asarray(
                rng.standard_normal(n_total).astype(np.float32)
                * rng.uniform(0.1, 8.0)
            )
            key = jax.random.key(trial)
            want = np.asarray(_searchsorted_oracle(key, logw, n_total))
            cdf = jnp.cumsum(jax.nn.softmax(logw))
            u0 = jax.random.uniform(key, ())
            got = np.concatenate([
                np.asarray(
                    systematic_invert_cdf_window(
                        cdf, u0, n_total, shard * n_local, n_local
                    )
                )
                for shard in range(n_shards)
            ])
            np.testing.assert_array_equal(
                got, want, err_msg=f"n={n_total} shards={n_shards}"
            )


def test_unknown_method():
    with pytest.raises(ValueError):
        resample_indices(jax.random.key(0), jnp.zeros(4), method="bogus")


def test_systematic_rows_match_gather():
    """The gather-free row materialization must reproduce
    ``particles[systematic_resample_indices(...)]`` bit-for-bit: same key
    -> same u0, same g arithmetic, same slot ownership."""
    from monte_carlo_localization_tpu.ops.resample import (
        systematic_resample_rows,
    )

    rng = np.random.default_rng(13)
    for n, m in [(1, 1), (2, 2), (7, 7), (10, 25), (25, 10), (1000, 1000),
                 (4096, 4096)]:
        for trial in range(5):
            logw = jnp.asarray(
                rng.standard_normal(n).astype(np.float32)
                * rng.uniform(0.1, 8.0)
            )
            particles = jnp.asarray(
                rng.standard_normal((n, 3)).astype(np.float32)
            )
            key = jax.random.key(n * 31 + trial)
            want = particles[
                systematic_resample_indices(key, logw, num_samples=m)
            ]
            got = systematic_resample_rows(
                key, logw, particles, num_samples=m
            )
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want), err_msg=f"n={n} m={m}"
            )


def test_systematic_rows_degenerate_and_vmap():
    from monte_carlo_localization_tpu.ops.resample import (
        systematic_resample_rows,
    )

    # single-winner cloud: every output row is the winner's
    logw = jnp.asarray([-1e9, 0.0, -1e9, -1e9])
    particles = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    rows = systematic_resample_rows(jax.random.key(3), logw, particles)
    np.testing.assert_array_equal(
        np.asarray(rows), np.tile(np.asarray(particles[1]), (4, 1))
    )

    # vmapped over fleet members (the fleet propose path)
    rng = np.random.default_rng(17)
    logw_f = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    parts_f = jnp.asarray(rng.standard_normal((5, 64, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(9), 5)
    got = jax.vmap(systematic_resample_rows)(keys, logw_f, parts_f)
    want = jnp.stack([
        parts_f[i][systematic_resample_indices(keys[i], logw_f[i])]
        for i in range(5)
    ])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resample_rows_multinomial_fallback():
    from monte_carlo_localization_tpu.ops.resample import resample_rows

    rng = np.random.default_rng(19)
    logw = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    particles = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    key = jax.random.key(5)
    want = particles[
        multinomial_resample_indices(key, logw)
    ]
    got = resample_rows(key, logw, particles, method="multinomial")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
