import textwrap

import pytest

from monte_carlo_localization_tpu.config import (
    MCLConfig,
    config_from_dict,
    load_config,
)


def test_defaults_match_reference_declarations():
    """Defaults mirror reference src/particle_filter.cpp:23-47."""
    cfg = MCLConfig()
    assert cfg.angle_step == 18
    assert cfg.max_particles == 2000
    assert cfg.max_viz_particles == 60
    assert cfg.squash_factor == 2.2
    assert cfg.max_range == 12.0
    assert cfg.z_short == 0.01
    assert cfg.z_max == 0.07
    assert cfg.z_rand == 0.12
    assert cfg.z_hit == 0.80
    assert cfg.sigma_hit == 8.0
    assert cfg.motion_dispersion_x == 0.05
    assert cfg.motion_dispersion_y == 0.025
    assert cfg.motion_dispersion_theta == 0.25
    assert cfg.wheelbase == 0.325
    assert cfg.timer_frequency == 100.0
    assert cfg.max_pose_range == 10000.0
    assert cfg.delay_compensation_factor == 1.5
    assert cfg.inv_squash_factor == pytest.approx(1 / 2.2)


def test_max_range_px():
    assert MCLConfig().max_range_px(0.05) == 240  # reference :195 semantics
    assert MCLConfig().max_range_px(0.058) == 206


def test_nested_ros_yaml(tmp_path):
    """The reference's nested schema, including vestigial keys."""
    p = tmp_path / "mcl_config.yaml"
    p.write_text(
        textwrap.dedent(
            """
            particle_filter:
              ros__parameters:
                max_particles: 4000
                timer_frequency: 200.0
                range_method: "cddt"
                theta_discretization: 112
                rangelib_variant: 2
                fine_timing: 0
                map_frame: "map"
                sim_mode: false
            map_server:
              ros__parameters:
                map: 'levine'
            """
        )
    )
    cfg = load_config(p)
    assert cfg.max_particles == 4000
    assert cfg.timer_frequency == 200.0
    assert cfg.map_name == "levine"
    # untouched fields keep defaults
    assert cfg.sigma_hit == 8.0


def test_flat_yaml(tmp_path):
    p = tmp_path / "flat.yaml"
    p.write_text("max_particles: 123\nz_hit: 0.9\n")
    cfg = load_config(p)
    assert cfg.max_particles == 123
    assert cfg.z_hit == 0.9


def test_strict_rejects_unknown():
    with pytest.raises(KeyError):
        config_from_dict({"totally_bogus": 1}, strict=True)
    # vestigial keys pass even in strict mode
    cfg = config_from_dict({"range_method": "cddt"}, strict=True)
    assert isinstance(cfg, MCLConfig)


def test_type_coercion():
    cfg = config_from_dict({"max_particles": "3000", "viz": "false"})
    assert cfg.max_particles == 3000
    assert cfg.viz is False


def test_reference_config_file_parses():
    """The shipped reference YAML must load as-is (if the mount exists)."""
    import os

    path = "/root/reference/config/mcl_config.yaml"
    if not os.path.exists(path):
        pytest.skip("reference mount not available")
    cfg = load_config(path)
    assert cfg.max_particles == 2000
    assert cfg.timer_frequency == 200.0
    assert cfg.lidar_offset_x == 0.288
    assert cfg.num_threads == 3
    assert cfg.map_name == "sibal1"


def test_shipped_config_file_loads():
    """The repo ships config/mcl_config.yaml in the reference's nested
    schema (launch/ and the ROS2 bridge point at it) — it must load and
    carry the documented defaults."""
    from pathlib import Path

    from monte_carlo_localization_tpu.config import load_config

    path = Path(__file__).resolve().parents[1] / "config" / "mcl_config.yaml"
    cfg = load_config(path)
    assert cfg.max_particles == 4000
    assert cfg.angle_step == 18
    assert cfg.squash_factor == 2.2
    assert cfg.lidar_offset_x == 0.288
    assert cfg.raycast_method == "auto"
