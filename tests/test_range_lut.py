import numpy as np
import pytest

import jax.numpy as jnp

from monte_carlo_localization_tpu.mapping import box_world, random_obstacle_world
from monte_carlo_localization_tpu.mapping.range_lut import (
    build_range_lut,
    build_range_lut_numpy,
    cached_range_lut,
)
from monte_carlo_localization_tpu.ops.raycast import cast_rays_dda, cast_rays_lut


def test_numpy_matches_native():
    from monte_carlo_localization_tpu.native import available

    if not available():
        pytest.skip("native lib unavailable")
    occ = np.asarray(random_obstacle_world(height=80, width=100, seed=1).occupied)
    a = build_range_lut_numpy(occ, 48, 120)
    b = build_range_lut(occ, 48, 120, backend="native")
    assert (a == b).all()


def test_lut_matches_dda_statistically(clutter_map):
    gm = clutter_map.with_range_lut(720, use_cache=False)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, gm.num_free_cells, 4000)
    cells = np.asarray(gm.free_cells)[idx]
    q = np.stack(
        [
            cells[:, 1] * gm.resolution + float(gm.origin_x) + 0.025,
            cells[:, 0] * gm.resolution + float(gm.origin_y) + 0.025,
            rng.uniform(-np.pi, np.pi, 4000),
        ],
        1,
    ).astype(np.float32)
    r_dda = np.asarray(cast_rays_dda(gm, jnp.asarray(q)))
    r_lut = np.asarray(cast_rays_lut(gm, jnp.asarray(q)))
    d = np.abs(r_lut - r_dda)
    # angle quantization puts a small tail on grazing rays; the bulk must
    # agree within ~2 px and the median within 1 px
    assert np.median(d) <= gm.resolution
    assert np.mean(d <= 3 * gm.resolution) > 0.95


def test_lut_axis_aligned_exact():
    """Along axis-aligned directions the LUT equals DDA to ~1 px."""
    gm = box_world(height=200, width=300).with_range_lut(360, use_cache=False)
    q = np.array(
        [
            [5.0, 5.0, 0.0],
            [5.0, 5.0, np.pi / 2],
            [5.0, 5.0, np.pi],
            [5.0, 5.0, -np.pi / 2],
        ],
        np.float32,
    )
    r_dda = np.asarray(cast_rays_dda(gm, jnp.asarray(q)))
    r_lut = np.asarray(cast_rays_lut(gm, jnp.asarray(q)))
    np.testing.assert_allclose(r_lut, r_dda, atol=2 * gm.resolution)


def test_lut_oob_query_returns_zero():
    gm = box_world().with_range_lut(90, use_cache=False)
    q = np.array([[-50.0, -50.0, 0.3]], np.float32)
    assert float(cast_rays_lut(gm, jnp.asarray(q))[0]) == 0.0


def test_lut_requires_attachment(clutter_map):
    with pytest.raises(ValueError):
        cast_rays_lut(clutter_map, jnp.zeros((1, 3)))


def test_lut_guards():
    occ = np.zeros((10, 10), bool)
    # max_range_px=300 is now served by the u16 LUT, not an error
    assert build_range_lut(occ, 8, max_range_px=300).dtype == np.uint16
    with pytest.raises(ValueError):
        build_range_lut(occ, 64, max_range_px=70000)  # beyond u16
    with pytest.raises(ValueError):
        build_range_lut(np.zeros((40000, 40000), bool), 1440, 240)  # memory
    with pytest.raises(ValueError):
        build_range_lut(occ, 64, 100, row_stride=32)  # stride < t_bins


def test_cache_roundtrip(tmp_path):
    occ = np.asarray(box_world(height=40, width=60).occupied)
    a = cached_range_lut(occ, 32, 100, cache_dir=tmp_path)
    files = list(tmp_path.glob("rlut_*.npy"))
    assert len(files) == 1
    b = cached_range_lut(occ, 32, 100, cache_dir=tmp_path)  # hits cache
    assert (np.asarray(a) == np.asarray(b)).all()


def test_cache_concurrent_builders(tmp_path):
    """Concurrent builders of the SAME cache entry (jax.distributed
    processes or filter threads sharing one cache dir) must each publish
    through a UNIQUE tmp file — a shared tmp name let the winner's
    os.replace delete the loser's half-saved file (FileNotFoundError,
    seen in the 2-process multihost dryrun)."""
    import threading

    occ = np.asarray(box_world(height=40, width=60).occupied)
    errs = []

    def build():
        try:
            cached_range_lut(occ, 32, 100, cache_dir=tmp_path)
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errs.append(e)

    threads = [threading.Thread(target=build) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert len(list(tmp_path.glob("rlut_*.npy"))) == 1
    assert not list(tmp_path.glob("*.tmp.npy"))  # no leaked tmp files
    c = cached_range_lut(occ, 32, 100, cache_dir=tmp_path)
    assert np.asarray(c).any()


def test_filter_with_lut_localizes(clutter_map, beams60, make_scan):
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter import ParticleFilter

    pf = ParticleFilter(
        clutter_map,
        MCLConfig(max_particles=1500, raycast_method="lut", lut_theta_bins=720),
    )
    pf.set_beam_angles(beams60)
    tp = np.array([10.0, 10.0, 0.5], np.float32)
    scan = make_scan(clutter_map, tp, beams60)
    state = pf.init_pose(tp, seed=0)
    for _ in range(12):
        state, pose = pf.step(state, np.zeros(3), scan)
    assert np.linalg.norm(np.asarray(pose)[:2] - tp[:2]) < 0.12


# ----- u16 LUT (max_range_px > 254; long-range / fine-resolution maps) -----

def test_u16_dtype_selection():
    from monte_carlo_localization_tpu.mapping.range_lut import lut_dtype

    assert lut_dtype(240) == np.uint8
    assert lut_dtype(254) == np.uint8
    assert lut_dtype(255) == np.uint16
    assert lut_dtype(300) == np.uint16
    with pytest.raises(ValueError, match="65534"):
        lut_dtype(70000)


def test_u16_numpy_matches_native():
    from monte_carlo_localization_tpu.native import available

    if not available():
        pytest.skip("native lib unavailable")
    occ = np.asarray(random_obstacle_world(height=80, width=100, seed=2).occupied)
    a = build_range_lut_numpy(occ, 48, 300)
    b = build_range_lut(occ, 48, 300, backend="native")
    assert a.dtype == np.uint16 and b.dtype == np.uint16
    assert (a == b).all()


def test_u16_lut_query_matches_dda():
    """The XLA lut query path is dtype-agnostic: a long-range map
    (max_range 20 m @ 0.05 -> 400 px) must round-trip through the u16 LUT."""
    gm = random_obstacle_world(
        height=160, width=160, seed=4, max_range_meters=20.0
    )
    assert gm.max_range_px == 400
    gm = gm.with_range_lut(720, use_cache=False, backend="auto")
    assert np.asarray(gm.range_lut).dtype == np.uint16
    rng = np.random.default_rng(0)
    idx = rng.integers(0, gm.num_free_cells, 500)
    cells = np.asarray(gm.free_cells)[idx]
    q = np.stack(
        [
            cells[:, 1] * gm.resolution + float(gm.origin_x) + 0.025,
            cells[:, 0] * gm.resolution + float(gm.origin_y) + 0.025,
            rng.uniform(-np.pi, np.pi, 500),
        ],
        1,
    ).astype(np.float32)
    r_dda = np.asarray(cast_rays_dda(gm, jnp.asarray(q)))
    r_lut = np.asarray(cast_rays_lut(gm, jnp.asarray(q)))
    # angle quantization at 720 bins: tolerance a few px (as the u8 test)
    err_px = np.abs(r_dda - r_lut) / gm.resolution
    assert np.median(err_px) <= 1.0
    assert np.percentile(err_px, 95) <= 4.0


def test_u16_range_beyond_254px_actually_observed():
    """An empty long-range map must produce LUT ranges above the u8 cap."""
    gm = box_world(height=500, width=500, max_range_meters=20.0)
    lut = build_range_lut(
        np.asarray(gm.occupied), 8, gm.max_range_px, backend="numpy"
    )
    assert lut.max() > 254


def test_lut_pallas_accepts_u16_maps():
    """Long-range maps (max_range_px > 254) run on the Pallas fast path
    with a u16 LUT (256 entries per 512 B DMA subrow); full numeric parity
    is covered in test_pallas_lut.TestKernelParityU16."""
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter import ParticleFilter

    gm = random_obstacle_world(
        height=120, width=120, seed=5, max_range_meters=20.0
    )
    pf = ParticleFilter(
        gm, MCLConfig(max_particles=64, raycast_method="lut_pallas")
    )
    beams = np.linspace(-2.0, 2.0, 30).astype(np.float32)
    pf.set_beam_angles(beams)
    assert np.asarray(pf.grid_map.range_lut).dtype == np.uint16
    state = pf.init_global(seed=0)
    state, pose = pf.step(state, np.zeros(3, np.float32),
                          np.full(len(beams), 4.0, np.float32))
    assert np.isfinite(np.asarray(pose)).all()


@pytest.mark.parametrize("max_range_px", [60, 300])
def test_native_compact_matches_dense(max_range_px):
    """The native compact builder's rows must equal the dense padded
    builder's rows for near cells, and the shared far row must be constant
    max_range_px (u8 and u16 layouts)."""
    from monte_carlo_localization_tpu.mapping.range_lut import lut_dtype
    from monte_carlo_localization_tpu.mapping.range_lut_device import (
        FAR_ROW_MARGIN,
        compact_row_map,
    )
    from monte_carlo_localization_tpu.mapping.grid_map import clearance_field
    from monte_carlo_localization_tpu.native import (
        available,
        native_build_compact_range_lut,
    )

    if not available():
        pytest.skip("native lib unavailable")
    gm = random_obstacle_world(height=90, width=70, num_obstacles=6, seed=9)
    occ = np.asarray(gm.occupied)
    t_bins, stride = 48, 128
    dtype = lut_dtype(max_range_px)
    clearance = clearance_field(occ, max_range_px + FAR_ROW_MARGIN + 2)
    row_map, row_cells = compact_row_map(clearance, max_range_px)
    compact = native_build_compact_range_lut(
        occ, t_bins, max_range_px, row_map, stride, dtype=dtype
    )
    assert compact is not None
    assert compact.dtype == dtype
    assert compact.shape == (len(row_cells) + 1, stride)
    assert (compact[0] == max_range_px).all()  # shared far row

    dense = build_range_lut(
        occ, t_bins, max_range_px, backend="native", row_stride=stride
    ).reshape(-1, stride)
    # near cells: padded rows match the dense padded build exactly
    np.testing.assert_array_equal(compact[row_map[row_cells]],
                                  dense[row_cells])
    # far cells really do see max_range everywhere (the dense build agrees)
    far = np.nonzero(row_map == 0)[0]
    if len(far):
        assert (dense[far] == max_range_px).all()


def test_lut_pallas_u16_compact_end_to_end(monkeypatch):
    """A long-range map forced onto the compact path (tiny
    MCL_LUT_DENSE_MAX) localizes through the Pallas kernel with the
    native-built u16 compact LUT + row map."""
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.filter import ParticleFilter
    from monte_carlo_localization_tpu.native import available
    from monte_carlo_localization_tpu.ops.raycast import cast_rays_dda

    if not available():
        pytest.skip("native lib unavailable")
    monkeypatch.setenv("MCL_LUT_DENSE_MAX", "1000000")  # force compact
    gm = random_obstacle_world(
        height=96, width=96, num_obstacles=10, seed=12, max_range_meters=20.0
    )
    assert gm.max_range_px > 254
    beams = np.linspace(-2.0, 2.0, 30).astype(np.float32)
    pose = np.array([2.4, 2.4, 0.5], np.float32)
    q = np.stack([np.full(30, pose[0]), np.full(30, pose[1]),
                  pose[2] + beams], 1).astype(np.float32)
    scan = np.asarray(cast_rays_dda(gm, jnp.asarray(q)))
    pf = ParticleFilter(
        gm, MCLConfig(max_particles=128, raycast_method="lut_pallas")
    )
    pf.set_beam_angles(beams)
    assert pf.grid_map.lut_row_map is not None  # compact path taken
    assert np.asarray(pf.grid_map.range_lut).dtype == np.uint16
    state = pf.init_pose(pose, seed=0)
    state, est = pf.step(state, np.zeros(3, np.float32), scan)
    est = np.asarray(est)
    assert np.linalg.norm(est[:2] - pose[:2]) < 0.3, est
