import numpy as np
import pytest

from monte_carlo_localization_tpu.mapping import box_world, random_obstacle_world
from monte_carlo_localization_tpu.mapping.range_lut import build_range_lut_numpy
from monte_carlo_localization_tpu.mapping.range_lut_device import (
    build_range_lut_jax,
)


@pytest.mark.parametrize(
    "hw,t,seed",
    [((80, 100), 48, 1), ((64, 64), 360, 2), ((50, 90), 33, 3)],
)
def test_device_builder_bit_exact(hw, t, seed):
    """The jax builder must match the numpy shear-scan oracle exactly."""
    occ = np.asarray(
        random_obstacle_world(height=hw[0], width=hw[1], seed=seed).occupied
    )
    a = build_range_lut_numpy(occ, t, 120)
    b = np.asarray(build_range_lut_jax(occ, t, 120))
    assert a.shape == b.shape == (hw[0], hw[1], t)
    np.testing.assert_array_equal(a, b)


def test_device_builder_via_gridmap():
    gm = box_world(height=60, width=80)
    g2 = gm.with_range_lut(36, backend="device")
    g3 = gm.with_range_lut(36, backend="numpy", use_cache=False)
    np.testing.assert_array_equal(np.asarray(g2.range_lut), np.asarray(g3.range_lut))


def test_device_builder_axis_aligned_truth():
    """Sanity: ranges along +x from an empty box interior."""
    gm = box_world(height=100, width=200, wall=2)
    occ = np.asarray(gm.occupied)
    lut = np.asarray(build_range_lut_jax(occ, 4, 240))  # bins at 0,90,180,270deg
    # cell (50, 10): wall interior starts at col 198 -> ~188 px to the right
    assert abs(int(lut[50, 10, 0]) - 187) <= 2
    # and ~8 px to the left (wall at col 2)
    assert abs(int(lut[50, 10, 2]) - 7) <= 2
