"""Typed configuration for the MCL engine.

Accepts the reference's ``mcl_config.yaml`` schema verbatim — including the
ROS2 ``particle_filter: ros__parameters:`` nesting and the vestigial keys the
reference node never reads (``range_method``, ``theta_discretization``,
``rangelib_variant``, ``fine_timing``, frame names; see
reference config/mcl_config.yaml:34-36,53-58).

Parameter names, defaults and semantics mirror the reference's declarations
(reference src/particle_filter.cpp:23-47).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping

import yaml

# Keys the reference YAML carries but the node never declares/reads
# (reference config/mcl_config.yaml:13,34-36,53-58). We accept and ignore them.
VESTIGIAL_KEYS = frozenset(
    {
        "range_method",
        "theta_discretization",
        "rangelib_variant",
        "fine_timing",
        "map_frame",
        "base_frame",
        "laser_frame",
        "sim_mode",
    }
)


@dataclass(frozen=True)
class MCLConfig:
    """All engine parameters. Defaults match reference src/particle_filter.cpp:23-47."""

    # --- core ---
    angle_step: int = 18  # lidar downsample stride
    max_particles: int = 2000
    max_viz_particles: int = 60
    squash_factor: float = 2.2  # likelihood ^= 1/squash_factor
    max_range: float = 12.0  # meters
    max_pose_range: float = 10000.0  # |x|,|y| bound for pose validity
    delay_compensation_factor: float = 1.5

    # --- sensor model (4-component beam model) ---
    z_hit: float = 0.80
    z_short: float = 0.01
    z_max: float = 0.07
    z_rand: float = 0.12
    sigma_hit: float = 8.0  # in PIXELS (the reference LUT is in px units)

    # --- motion model noise (std-dev, per step) ---
    motion_dispersion_x: float = 0.05
    motion_dispersion_y: float = 0.025
    motion_dispersion_theta: float = 0.25

    # --- robot geometry ---
    lidar_offset_x: float = 0.0
    lidar_offset_y: float = 0.0
    wheelbase: float = 0.325  # declared but unused in propagation, as in reference

    # --- runtime / io ---
    scan_topic: str = "/scan"
    odom_topic: str = "/odom"
    publish_odom: bool = True
    viz: bool = True
    timer_frequency: float = 100.0  # Hz of the host update loop

    # --- engine knobs (new; TPU-native) ---
    use_parallel_raycasting: bool = True  # kept for config compat; engine is always batched
    num_threads: int = 0  # used by the native host raycaster (0 = auto)
    # "auto" (default: the fused Pallas kernel on accelerators, the XLA
    # "lut" path on CPU — resolved by resolve_raycast_method) |
    # "lut_pallas" (fused TPU kernel, fastest) | "lut" (precomputed, one
    # gather/query, fast everywhere) | "sphere" (EDT marching, no
    # precompute) | "dda" (reference-exact oracle).
    raycast_method: str = "auto"
    sphere_march_iters: int = 48  # fixed sphere-marching trip count
    lut_theta_bins: int = 1440  # angle quantization of the "lut" backend (0.25 deg)
    sensor_model_mode: str = "analytic"  # "analytic" (gather-free) | "table" (reference LUT)
    # particles per Pallas-kernel grid step (lut_pallas) — an upper bound;
    # the engine picks the largest divisor of the per-member particle
    # count <= this (ops.pallas_lut.pick_block). Larger blocks amortize
    # grid overhead (80 ~9% over 16 at 4000x1080 on v5e) at the cost of
    # 2*block*window_bytes VMEM scratch. 0 = auto
    # (ops.pallas_lut.resolve_block_cap): cap 80 for small launches, 160
    # once one kernel launch processes >= 32k particle rows (members x
    # particles for a fleet chunk) — the v5e re-sweep after the
    # compact-beam path measured 160 as -12% at 4000 rows but +6% at
    # 100k rows (config #4) and +4.5% at 16x4000-row fleet chunks
    # (config #5), where the grid-iteration floor dominates.
    pallas_block: int = 0
    # unique-window DMA dedup (lut_pallas, single filter only): 0 = off
    # (the default), S > 0 = force S slots/block, -1 = auto (off). Kept as
    # a MEASURED NEGATIVE RESULT (PERF.md): on v5e the dynamic-VMEM-index
    # read Mosaic emits for the slot lookup costs ~10us/particle — ~180x
    # the DMA issues it saves — and the kernel was never the config #4
    # bottleneck anyway (the fused likelihood is ~5 ms at 100k). Blocks
    # with > S distinct windows fall back to the one-DMA-per-particle
    # kernel inside the same jitted step, so the path stays correct.
    pallas_dedup_slots: int = 0
    # with pallas_dedup_slots > 0: gather each particle's window from the
    # block's <= S slot tiles via a one-hot MXU matmul instead of the
    # dynamic VMEM leading index (the measured ~10us/particle Mosaic
    # pathology that killed the first dedup variant, PERF.md). Exact
    # integer selection — results stay bit-identical. Experimental knob
    # for the config #4 DMA-issue-floor question (VERDICT round-2 item 4).
    pallas_dedup_matmul: bool = False
    # sub-bin angular refinement (lut_pallas): keep the fractional part of
    # the particle heading's theta-bin position and linearly interpolate
    # each beam's expected range between its LUT bin and the +1 neighbor
    # (already resident in the DMA'd window — no extra memory traffic).
    # Removes the coherent +-half-bin (0.125 deg at T~1440) heading
    # quantization. MEASURED NEGATIVE as a default (2026-08-20, golden
    # trace, 1x v5e): replay RMSE 0.0486 m with vs 0.0482 m without —
    # the filter's error floor is the trace/posterior itself (the exact-
    # DDA CPU oracle scores 0.0401 m on the same 500 corrections) — while
    # the compact-beam matmul must run at HIGHEST precision under lerp,
    # costing ~13% throughput (3038 -> 2643 updates/s at 4000x60). Kept
    # as an opt-in for workloads where heading quantization actually
    # binds (coarse theta bins / very long ranges); see PERF.md.
    pallas_subbin: bool = False
    # mega-fused chained step (lut_pallas + step_many only): the ENTIRE
    # correction — systematic resample (triangular-matmul cumsum + one-
    # hot MXU ancestor gather), motion, window addressing, the DMA
    # likelihood pipeline and the pose moment sums — runs as ONE Pallas
    # program per step, eliminating the resample/motion/pose XLA fusions
    # and the ~0.107 ms/step inter-kernel residual the round-4 ablation
    # measured (PERF.md:96-106, bounded ~1.6x headline upside). Dense-
    # LUT single maps on the analytic path only (the compact LUT's
    # row_map gather cannot live in-kernel); the RNG stream matches the
    # classic path draw-for-draw (hoisted out of the scan, not replaced).
    # Default OFF until the hardware A/B records a win (see PERF.md).
    pallas_mega: bool = False
    # distributed resampling of ShardedParticleFilter: "bucketed" (default
    # — covered ancestor rows cross shards through fringe ppermutes + a
    # tiny seed psum, O(fringe + D) ICI bytes/step; falls back to the
    # all-gather path via lax.cond if a source lands beyond the fringe) |
    # "allgather" (compat: full N x 3 particle + N-CDF all_gather, O(N)
    # bytes — the SURVEY §7 hard-part-6 anti-pattern, kept as the
    # fallback/bitwise-reference path).
    sharded_resample: str = "bucketed"
    # fringe capacity (slots per side) of the bucketed exchange; 0 = auto
    # (max(64, n_local // 8)). Larger fringes tolerate more cross-shard
    # weight imbalance before the all-gather fallback fires, at O(fringe)
    # extra ICI bytes.
    sharded_fringe: int = 0
    resample_method: str = "systematic"  # "systematic" | "multinomial" (reference compat)
    exact_dt_heuristic: bool = True  # reproduce reference dt reconstruction (:452-471)
    # pipeline live corrections: dispatch without blocking, harvest poses
    # as the device finishes them (the anchor refresh is then a few
    # dispatches stale — the staleness delay compensation already models).
    # Decouples the correction rate from the device->host round trip on
    # remote-attached accelerators; replay()/replay_chained() ignore it.
    async_correction: bool = False
    # max corrections in flight before the harvest blocks. 4 measured ~2x
    # the blocking rate through a remote-TPU tunnel; very deep pipelines
    # (16+) can stall remote transports outright — keep this small.
    async_depth: int = 4
    # micro-chunked live corrections (async path only): buffer K ticks of
    # (action, scan) and dispatch them as ONE step_many(K) — the per-
    # dispatch host->device overhead then amortizes over K corrections,
    # trading <= K-1 ticks of extra pose latency (the anchor's staleness
    # compensation measures and corrects the delay exactly). 1 = off.
    live_chunk: int = 1
    # lax.scan unroll factor for the step_many chains. MEASURED NEUTRAL
    # (PERF.md, 2026-08-20 v5e): an interleaved same-process A/B at the
    # 4000x1080 headline gives 1860.8 / 1858.6 / 1887.1 updates/s for
    # unroll 1/2/4 — the ~0.1 ms/update non-phase residual the ablation
    # found is per-step-body XLA overhead (inter-kernel gaps around the
    # Pallas call), not loop bookkeeping, so unrolling cannot remove it.
    # Default 1 (unrolling only multiplies compile time); the knob stays
    # for future hardware where the tradeoff may differ.
    scan_unroll: int = 1
    dtype: str = "float32"
    seed: int = 0

    # --- automatic re-localization (new; the reference's README describes
    # convergence-based auto-init aspirationally but ships no detector —
    # kidnapped-robot recovery there is human-triggered via /clicked_point).
    # Augmented-MCL style monitor (Probabilistic Robotics §8.3): short- and
    # long-horizon EMAs of the per-correction measurement quality; a
    # sustained collapse of fast/slow triggers a global re-init.
    # Default OFF — measured decision (BENCHES.md kidnap table, 2026-08-20):
    # reference parity (recovery there is operator-triggered), and in
    # symmetric corridors a triggered re-init can abandon a CORRECT lock.
    # Flip ON for unattended operation: closed-loop recovery measured at
    # 10/15 kidnaps, median 12.5 updates, zero false positives with these
    # thresholds. ---
    auto_reinit: bool = False
    # recovery action once the monitor fires: "reinit" = full global
    # re-initialization (all-or-nothing — measured 10/15 kidnap recovery
    # but 2/15 re-locks into a mirrored mode it can never escape and false
    # alarms abandon a CORRECT track); "inject" = true Augmented MCL
    # (Probabilistic Robotics §8.3): replace a max(0, 1 - w_fast/w_slow)
    # fraction of particles with uniform free-space draws EACH correction
    # — preserves the current track on false alarms and continuously seeds
    # escape hypotheses in symmetric environments (the mirrored-mode
    # class full re-init cannot fix). See BENCHES.md kidnap table.
    reinit_mode: str = "reinit"
    reinit_alpha_slow: float = 0.05  # long-horizon EMA rate (w_slow)
    reinit_alpha_fast: float = 0.40  # short-horizon EMA rate (w_fast)
    reinit_ratio_threshold: float = 0.25  # trigger when w_fast/w_slow stays below
    reinit_patience: int = 10  # consecutive bad corrections before re-init
    reinit_min_iters: int = 30  # corrections before the monitor arms
    reinit_cooldown: int = 50  # corrections to hold off after a re-init
    # "inject" mode: fraction = clip(gain * (1 - w_fast/w_slow), 0, max).
    # The cap keeps a sudden quality collapse from wiping the whole
    # posterior in one step (recovery needs a few corrections of evidence
    # accumulation either way); the gain scales the textbook fraction.
    reinit_inject_max: float = 0.3
    reinit_inject_gain: float = 1.0

    # --- map (from the map_server section / launch arg) ---
    map_name: str = "sibal1"
    map_dir: str = ""

    @property
    def inv_squash_factor(self) -> float:
        return 1.0 / self.squash_factor

    def max_range_px(self, resolution: float) -> int:
        """MAX_RANGE_PX = max_range / map_resolution (reference :195)."""
        return int(self.max_range / resolution)

    def replace(self, **kw: Any) -> "MCLConfig":
        return dataclasses.replace(self, **kw)


def resolve_raycast_method(method: str, backend: str | None = None) -> str:
    """Resolve ``"auto"`` to the best backend for the current device.

    The flagship fused Pallas kernel is the default on real accelerators;
    on CPU the kernel only runs in (slow) interpret mode, so the XLA
    ``"lut"`` path is picked instead. Explicit methods pass through
    unchanged. The engine falls back from an auto-selected ``lut_pallas``
    to ``"lut"`` if the map/beam geometry is unsupported (see
    ``ParticleFilter._rebuild_step``)."""
    if method != "auto":
        return method
    if backend is None:
        import jax

        backend = jax.default_backend()
    return "lut" if backend == "cpu" else "lut_pallas"


_FIELD_NAMES = {f.name for f in dataclasses.fields(MCLConfig)}

# Keys in the engine that don't exist in the reference YAML get engine defaults;
# reference YAML keys that have no engine field must be vestigial or error.
_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(MCLConfig) if f.type in ("bool", bool)
}


def _coerce(name: str, value: Any) -> Any:
    """Coerce YAML scalars to the dataclass field types."""
    for f in dataclasses.fields(MCLConfig):
        if f.name != name:
            continue
        ftype = f.type if isinstance(f.type, str) else f.type.__name__
        if ftype == "int":
            return int(value)
        if ftype == "float":
            return float(value)
        if ftype == "bool":
            if isinstance(value, str):
                return value.strip().lower() in ("1", "true", "yes", "on")
            return bool(value)
        if ftype == "str":
            return str(value)
    return value


def config_from_dict(params: Mapping[str, Any], strict: bool = False) -> MCLConfig:
    """Build an :class:`MCLConfig` from a flat parameter mapping.

    Unknown keys are tolerated like the reference node tolerates vestigial
    YAML keys; with ``strict=True``, unknown non-vestigial keys raise.
    """
    kw: dict[str, Any] = {}
    for key, value in params.items():
        if key in _FIELD_NAMES:
            kw[key] = _coerce(key, value)
        elif key in VESTIGIAL_KEYS:
            continue
        elif strict:
            raise KeyError(f"Unknown MCL config key: {key!r}")
    return MCLConfig(**kw)


def load_config(path: str | Path, strict: bool = False) -> MCLConfig:
    """Load a config YAML in the reference's schema.

    Handles both the nested ROS2 layout::

        particle_filter:
          ros__parameters:
            max_particles: 2000
            ...
        map_server:
          ros__parameters:
            map: 'sibal1'

    and a flat ``key: value`` layout.
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    params: dict[str, Any] = {}
    if "particle_filter" in raw and isinstance(raw["particle_filter"], dict):
        params.update(raw["particle_filter"].get("ros__parameters", {}) or {})
    else:
        params.update({k: v for k, v in raw.items() if k not in ("map_server",)})

    map_section = raw.get("map_server", {})
    if isinstance(map_section, dict):
        ros_params = map_section.get("ros__parameters", map_section)
        if isinstance(ros_params, dict) and "map" in ros_params:
            params["map_name"] = ros_params["map"]

    return config_from_dict(params, strict=strict)
