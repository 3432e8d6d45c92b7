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

    One uniform offset u0 ~ U[0,1); target positions (i + u0)/N are inverted
    through the weight CDF with a vectorized searchsorted. O(N log N) work,
    single kernel, far lower variance than multinomial.
    """
    n = log_weights.shape[0] if num_samples is None else num_samples
    w = _normalized_weights(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    positions = (jnp.arange(n, dtype=cdf.dtype) + u0) / n
    idx = jnp.searchsorted(cdf, positions)
    return jnp.clip(idx, 0, log_weights.shape[0] - 1).astype(jnp.int32)


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
