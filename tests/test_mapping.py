import numpy as np
import pytest
import yaml
from PIL import Image

from monte_carlo_localization_tpu.mapping import (
    box_world,
    euclidean_distance_transform,
    load_map,
    map_from_occupancy,
    occupancy_from_image,
)
from monte_carlo_localization_tpu.mapping.edt import _edt_numpy, clearance_field
from monte_carlo_localization_tpu.mapping.grid_map import (
    OCC_FREE,
    OCC_OCCUPIED,
    OCC_UNKNOWN,
)


def brute_force_edt(obstacle):
    h, w = obstacle.shape
    ys, xs = np.nonzero(obstacle)
    pts = np.stack([ys, xs], 1)
    out = np.empty((h, w))
    for i in range(h):
        for j in range(w):
            d = np.sqrt(((pts - [i, j]) ** 2).sum(1)).min()
            out[i, j] = d
    return out.astype(np.float32)


def test_edt_matches_brute_force():
    rng = np.random.default_rng(0)
    obstacle = rng.random((24, 31)) < 0.1
    obstacle[0, 0] = True  # ensure nonempty
    expected = brute_force_edt(obstacle)
    for backend in ("numpy", "scipy"):
        got = euclidean_distance_transform(obstacle, backend=backend)
        np.testing.assert_allclose(got, expected, atol=1e-4), backend


def test_edt_native_matches_numpy():
    from monte_carlo_localization_tpu.native import available, native_edt

    if not available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    obstacle = rng.random((60, 45)) < 0.07
    obstacle[5, 5] = True
    np.testing.assert_allclose(
        native_edt(obstacle), _edt_numpy(obstacle), atol=1e-4
    )


def test_clearance_field_counts_border():
    """Map border is an obstacle for the marcher (reference returns a hit
    at map bounds, src/particle_filter.cpp:629-634)."""
    obstacle = np.zeros((11, 11), bool)
    c = clearance_field(obstacle, max_range_px=100)
    # center cell: nearest virtual border cell is 6 cells away (padded ring)
    assert c[5, 5] == pytest.approx(6.0)
    assert c[0, 0] == pytest.approx(1.0)


def test_occupancy_from_image_trinary():
    img = np.array(
        [[254, 0, 128]], dtype=np.uint8
    )  # free(white), occupied(black), unknown(gray)
    occ = occupancy_from_image(img)
    assert occ[0, 0] == OCC_FREE
    assert occ[0, 1] == OCC_OCCUPIED
    assert occ[0, 2] == OCC_UNKNOWN


def test_occupancy_negate():
    img = np.array([[254, 0]], dtype=np.uint8)
    occ = occupancy_from_image(img, negate=1)
    assert occ[0, 0] == OCC_OCCUPIED
    assert occ[0, 1] == OCC_FREE


def test_image_vertical_flip():
    """Image row 0 (top) must land at the HIGHEST occupancy row."""
    img = np.full((4, 3), 254, np.uint8)
    img[0, :] = 0  # black stripe at image TOP
    occ = occupancy_from_image(img)
    assert np.all(occ[3, :] == OCC_OCCUPIED)  # top of world = last row
    assert np.all(occ[0, :] == OCC_FREE)


def test_load_map_yaml(tmp_path):
    img = np.full((40, 60), 254, np.uint8)
    img[:2, :] = 0
    img[-2:, :] = 0
    img[:, :2] = 0
    img[:, -2:] = 0
    Image.fromarray(img).save(tmp_path / "m.png")
    (tmp_path / "m.yaml").write_text(
        yaml.dump(
            dict(
                image="m.png",
                resolution=0.05,
                origin=[-1.0, -0.5, 0.0],
                negate=0,
                occupied_thresh=0.65,
                free_thresh=0.196,
            )
        )
    )
    gm = load_map(tmp_path / "m.yaml")
    assert gm.name == "m"
    assert gm.height == 40 and gm.width == 60
    assert gm.resolution == 0.05
    assert gm.origin_x == -1.0 and gm.origin_y == -0.5
    assert gm.max_range_px == 240
    assert gm.num_free_cells == 36 * 56


def test_grid_world_roundtrip():
    gm = box_world(origin=(-2.0, -1.0, 0.0))
    x, y = gm.grid_to_world(10, 20)
    assert x == pytest.approx(20 * 0.05 - 2.0)
    assert y == pytest.approx(10 * 0.05 - 1.0)
    gx, gy = gm.world_to_grid(x, y)
    assert float(gx) == pytest.approx(20.0)
    assert float(gy) == pytest.approx(10.0)


def test_unknown_cells_not_obstacles():
    """Unknown (-1) is not an obstacle for the ray caster (reference :642
    checks data > 50) but IS excluded from free space (reference :208)."""
    occ = np.full((20, 20), OCC_UNKNOWN, np.int8)
    occ[5:15, 5:15] = OCC_FREE
    occ[0, 0] = OCC_OCCUPIED
    gm = map_from_occupancy(occ, 0.05)
    occupied = np.asarray(gm.occupied)
    permissible = np.asarray(gm.permissible)
    assert occupied.sum() == 1
    assert permissible.sum() == 100


def test_reference_maps_load():
    """Shipped reference map assets load as-is (when the mount exists)."""
    import os

    base = "/root/reference/maps"
    if not os.path.isdir(base):
        pytest.skip("reference mount not available")
    gm = load_map(f"{base}/sibal1.yaml")
    assert (gm.height, gm.width) == (177, 350)
    assert gm.num_free_cells > 1000
    gm2 = load_map(f"{base}/first_map.yaml")
    assert gm2.num_free_cells > 100
