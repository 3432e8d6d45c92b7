"""Viz renderer tests — the RViz-display-set analogue (reference
rviz/particle_filter.rviz:1-227 displays map + PoseArray + Pose + TF;
here they render to PNG frames)."""

import numpy as np

from monte_carlo_localization_tpu.runtime.viz import (
    VizSink,
    map_image,
    render_frame,
    world_to_px,
)


def test_map_image_shading_and_orientation(box_map):
    img = map_image(box_map, scale=1)
    occ = np.asarray(box_map.occupancy)
    h, w = occ.shape
    assert img.size == (w, h)
    arr = np.asarray(img)
    # row 0 of the grid is the image BOTTOM row (ROS lower-left origin)
    assert (arr[h - 1, :, 0] == np.where(occ[0] == 0, 254,
                                         np.where(occ[0] > 50, 0, 205))).all()
    # walls render black, interior free space white
    assert (arr[..., 0] == 0).any() and (arr[..., 0] == 254).any()


def test_world_to_px_roundtrip(box_map):
    # the world position of a cell CENTER must land in that pixel
    row, col = 5, 7
    x, y = box_map.grid_to_world(row, col)  # cell-corner convention
    half = 0.5 * box_map.resolution
    (u, v), = world_to_px(box_map, np.array([[x + half, y + half]]), scale=1)
    h = np.asarray(box_map.occupancy).shape[0]
    assert int(u) == col
    assert int(v) == h - 1 - row


def test_render_frame_draws_particles_and_pose(box_map):
    h, w = np.asarray(box_map.occupancy).shape
    res = box_map.resolution
    cx = float(box_map.origin_x) + 0.5 * w * res
    cy = float(box_map.origin_y) + 0.5 * h * res
    particles = np.array([[cx, cy, 0.0], [cx + res, cy, 1.0]], np.float32)
    weights = np.array([0.1, 0.9], np.float32)
    base = np.asarray(map_image(box_map, scale=1))
    img = render_frame(box_map, particles=particles, weights=weights,
                       pose=np.array([cx, cy, 0.5]),
                       trajectory=np.array([[cx - res, cy], [cx, cy]]),
                       scale=1)
    assert img.size == (w, h)
    # something got drawn over the underlay
    assert (np.asarray(img) != base).any()


def test_viz_sink_writes_frames_and_overview(box_map, tmp_path):
    sink = VizSink(box_map, tmp_path / "viz", every=2)
    assert sink.wants("pose") and sink.wants("particles")
    assert not sink.wants("tf")
    h, w = np.asarray(box_map.occupancy).shape
    res = box_map.resolution
    cx = float(box_map.origin_x) + 0.5 * w * res
    cy = float(box_map.origin_y) + 0.5 * h * res
    cloud = np.array([[cx, cy, 0.0]], np.float32)
    for i in range(5):
        sink.publish("particles", float(i), {"cloud": cloud})
        sink.publish("pose", float(i), {"pose": np.array([cx, cy + i * res, 0.0])})
    sink.close()
    frames = sorted((tmp_path / "viz").glob("frame_*.png"))
    assert len(frames) == 3  # corrections 1, 3, 5 with every=2
    assert (tmp_path / "viz" / "trajectory.png").exists()


def test_node_replay_with_viz_sink(box_map, tmp_path):
    """End-to-end: MCLNode replay publishes through a VizSink."""
    from monte_carlo_localization_tpu.config import MCLConfig
    from monte_carlo_localization_tpu.runtime import MCLNode, synthesize_trace

    trace = synthesize_trace(box_map, duration_s=2.0, num_beams=60, seed=3)
    cfg = MCLConfig(max_particles=200, raycast_method="lut",
                    lut_theta_bins=180)
    node = MCLNode(box_map, cfg)
    sink = VizSink(box_map, tmp_path / "viz", every=5)
    node.add_sink(sink)
    node.initialize_pose(trace.truth_pose[0])
    node.replay(trace)
    node.close_sinks()
    assert sink.frames_written >= 1
    assert (tmp_path / "viz" / "trajectory.png").exists()
