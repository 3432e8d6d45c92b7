"""Resampling primitives (device-side, O(N), fully vectorized).

The reference uses multinomial resampling via std::discrete_distribution
(reference src/particle_filter.cpp:657-665). The TPU engine defaults to
low-variance systematic resampling (cumsum + a gather-free scatter/cummax
CDF inversion instead of N sequential draws) and keeps multinomial as a
compatibility mode. Both operate on LOG weights, normalized internally.
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
    One scatter + one cummax, no gathers. Agrees with the searchsorted
    formulation on every tested platform (pinned by
    tests/test_resample.py), though the two compute the boundary
    comparison in algebraically rearranged f32 forms — a knife-edge
    weight vector could in principle flip one slot by an ulp, and either
    answer is a valid systematic resample.
    """
    n = log_weights.shape[0]
    m = n if num_samples is None else num_samples
    w = _normalized_weights(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    return systematic_invert_cdf_window(cdf, u0, m, 0, m)


def systematic_invert_cdf_window(
    cdf: jnp.ndarray,
    u0: jnp.ndarray,
    num_samples: int,
    slot0,
    window: int,
) -> jnp.ndarray:
    """Invert a systematic-resampling CDF for output slots
    ``[slot0, slot0 + window)`` — scatter-side, no gathers.

    With ``g[j] = num_samples·cdf[j] - u0``, source j owns output slots
    ``(g[j-1], g[j]]``, so its first slot is ``floor(g[j-1]) + 1``. Scatter
    j into the window (out-of-window slots drop; collisions between
    zero-count sources and the covering source resolve with ``max`` — the
    covering source always carries the largest j at its slot), seed slot 0
    with the boundary source covering ``slot0`` (the smallest j with
    ``g[j] >= slot0``, i.e. ``#{j: g[j] < slot0}`` — a pure reduction),
    and forward-fill with a cumulative max. ``slot0`` may be traced (the
    sharded filter passes ``shard · n_local``); ``window`` must be static.
    Returns int32 ``(window,)`` source indices.
    """
    n = cdf.shape[0]
    g = num_samples * cdf - u0
    first_slot = (
        jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.floor(g[:-1]).astype(jnp.int32) + 1]
        )
        - slot0
    )
    src = jnp.arange(n, dtype=jnp.int32)
    seeded = jnp.zeros(window, jnp.int32).at[first_slot].max(src, mode="drop")
    j0 = jnp.sum((g < slot0).astype(jnp.int32))
    seeded = seeded.at[0].max(j0)
    return jnp.clip(jax.lax.cummax(seeded), 0, n - 1)


def systematic_resample_rows(
    key: jax.Array,
    log_weights: jnp.ndarray,
    particles: jnp.ndarray,
    num_samples: int | None = None,
) -> jnp.ndarray:
    """Systematic resampling that MATERIALIZES the proposal rows without a
    gather.

    ``particles[systematic_resample_indices(...)]`` pays an (M, D) scattered
    gather — XLA:TPU gathers run ~1e8 elem/s, ~3.5 ms at M=100k (config #4's
    single largest non-kernel cost). Ownership of output slots is already
    known scatter-side (see :func:`systematic_invert_cdf_window`): source j
    covers the contiguous slot range ``[floor(g[j-1])+1, floor(g[j])]`` with
    ``g[j] = M*cdf[j] - u0``, so each covered source scatters its ROW into
    its first slot (at most one writer per slot — zero-count sources are
    dropped outright instead of max-resolved) and a "last valid wins"
    associative scan forward-fills the remaining slots. One (M, D) scatter +
    one log-depth elementwise scan, no gathers. Bitwise-identical to the
    gather formulation (same g arithmetic, same ownership; pinned by
    tests/test_resample.py).
    """
    n = log_weights.shape[0]
    m = n if num_samples is None else num_samples
    w = _normalized_weights(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())

    g = m * cdf - u0
    floors = jnp.floor(g).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), floors[:-1]]
    )
    # source j owns slots [prev[j]+1, floors[j]]; it owns at least one
    # slot iff floors[j] > prev[j], and first slots of covered sources are
    # strictly increasing, so each slot has at most ONE writer
    covered = floors > prev
    target = jnp.where(covered, prev + 1, m)  # m = out of range -> dropped
    valid = (
        jnp.zeros((m,), jnp.bool_).at[target].set(True, mode="drop")
    )
    rows = (
        jnp.zeros((m,) + particles.shape[1:], particles.dtype)
        .at[target]
        .set(particles, mode="drop")
    )

    def last_valid(a, b):
        av, ar = a
        bv, br = b
        keep_b = bv.reshape(bv.shape + (1,) * (br.ndim - bv.ndim))
        return av | bv, jnp.where(keep_b, br, ar)

    # Seed slot 0 with its covering source j0 = #{j: g[j] < 0}, exactly as
    # systematic_invert_cdf_window does. In exact arithmetic the scatter
    # already wrote particles[j0] there (g[n-1] = m - u0 >= 0 guarantees a
    # writer), but f32 cumsum round-off can leave cdf[n-1] < 1 and — for
    # small m and u0 on the knife edge — no j with floors[j] >= 0 at all;
    # the clip then lands on source n-1, matching the indices version.
    j0 = jnp.clip(jnp.sum((g < 0).astype(jnp.int32)), 0, n - 1)
    rows = rows.at[0].set(jnp.take(particles, j0, axis=0))
    valid = valid.at[0].set(True)
    _, filled = jax.lax.associative_scan(last_valid, (valid, rows))
    return filled


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


def resample_rows(
    key: jax.Array,
    log_weights: jnp.ndarray,
    particles: jnp.ndarray,
    method: str = "systematic",
    num_samples: int | None = None,
) -> jnp.ndarray:
    """Resampled proposal rows; gather-free for the systematic default."""
    if method == "systematic":
        return systematic_resample_rows(key, log_weights, particles, num_samples)
    idx = resample_indices(key, log_weights, method, num_samples)
    return particles[idx]
