"""Resampling primitives (device-side, O(N), fully vectorized).

The reference uses multinomial resampling via std::discrete_distribution
(reference src/particle_filter.cpp:657-665). The TPU engine defaults to
low-variance systematic resampling (cumsum + searchsorted — one scan and one
vectorized binary search instead of N sequential draws) and keeps multinomial
as a compatibility mode. Both operate on LOG weights, normalized internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalized_weights(log_weights: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(log_weights)


def multinomial_resample_indices(
    key: jax.Array, log_weights: jnp.ndarray, num_samples: int | None = None
) -> jnp.ndarray:
    """N iid draws from Categorical(weights) — reference-compatible mode."""
    n = log_weights.shape[0] if num_samples is None else num_samples
    return jax.random.categorical(key, log_weights, shape=(n,)).astype(jnp.int32)


def systematic_resample_indices(
    key: jax.Array, log_weights: jnp.ndarray, num_samples: int | None = None
) -> jnp.ndarray:
    """Low-variance systematic resampling.

    One uniform offset u0 ~ U[0,1); target position (i + u0)/M for output
    slot i is inverted through the weight CDF. The textbook inversion is
    ``searchsorted(cdf, positions)``, but XLA:TPU lowers that binary search
    to ~log2(N) serialized gather rounds (~15 ms at N=100k — it dominated
    config #4's step). Instead the inversion is computed scatter-side in
    O(N): source j's FIRST output slot is ``floor(M·cdf[j-1] - u0) + 1``;
    scatter j there (slot collisions between zero-count sources and the one
    covering source resolve with ``max`` — the covering source always has
    the largest j at that slot) and forward-fill with a cumulative max.
    One scatter + one cummax, no gathers; bit-identical to the
    searchsorted formulation (pinned by tests/test_resample.py).
    """
    n = log_weights.shape[0]
    m = n if num_samples is None else num_samples
    w = _normalized_weights(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    # g[j] = M·cdf[j] - u0: source j owns output slots (g[j-1], g[j]]
    g = m * cdf - u0
    first_slot = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.floor(g[:-1]).astype(jnp.int32) + 1]
    )
    src = jnp.arange(n, dtype=jnp.int32)
    # slots >= M (sources past the last position) drop out of the scatter
    seeded = jnp.zeros(m, jnp.int32).at[first_slot].max(src, mode="drop")
    return jax.lax.cummax(seeded)


def resample_indices(
    key: jax.Array,
    log_weights: jnp.ndarray,
    method: str = "systematic",
    num_samples: int | None = None,
) -> jnp.ndarray:
    if method == "systematic":
        return systematic_resample_indices(key, log_weights, num_samples)
    if method == "multinomial":
        return multinomial_resample_indices(key, log_weights, num_samples)
    raise ValueError(f"Unknown resample method: {method!r}")
