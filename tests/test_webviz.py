"""Interactive live viewer (runtime/webviz.py) — the RViz analogue.

Drives the real HTTP server end-to-end with urllib: page, frame stream,
state JSON, and the two RViz-tool interactions (press-drag pose estimate
-> /initialpose like reference src/particle_filter.cpp:355-374, global
re-init -> /global like :376-379).
"""

import json
import urllib.request

import numpy as np
import pytest

from monte_carlo_localization_tpu.config import MCLConfig
from monte_carlo_localization_tpu.runtime import MCLNode, WebViz
from monte_carlo_localization_tpu.runtime.viz import world_to_px


@pytest.fixture()
def served(clutter_map, beams60):
    node = MCLNode(
        clutter_map,
        MCLConfig(max_particles=128, raycast_method="sphere"),
        rng_seed=0,
    )
    viz = WebViz(node, clutter_map, port=0).start()
    yield node, viz
    viz.close()


def _get(viz, path):
    with urllib.request.urlopen(viz.url.rstrip("/") + path, timeout=10) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _post(viz, path, payload=None):
    req = urllib.request.Request(
        viz.url.rstrip("/") + path,
        data=json.dumps(payload or {}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read() or b"{}")


class TestWebViz:
    def test_page_frame_and_state(self, served):
        node, viz = served
        code, body, ctype = _get(viz, "/")
        assert code == 200 and b"tpu-mcl" in body and "html" in ctype
        code, png, ctype = _get(viz, "/frame.png")
        assert code == 200 and png[:4] == b"\x89PNG" and ctype == "image/png"
        code, body, _ = _get(viz, "/state.json")
        s = json.loads(body)
        assert len(s["pose"]) == 3 and "iters" in s and "log_quality" in s

    def test_drag_gesture_sets_pose_estimate(self, served):
        """Press-drag in image pixels re-seeds the cloud at the pressed
        world point with the drag direction as heading (RViz 2D Pose
        Estimate semantics)."""
        node, viz = served
        target = np.array([10.0, 10.0])
        (u0, v0), = world_to_px(viz.gm, target[None], viz.scale)
        # drag 30 px to the right => heading ~0; image v grows down
        code, out = _post(
            viz, "/initialpose",
            dict(u0=u0, v0=v0, u1=u0 + 30.0, v1=v0),
        )
        assert code == 200
        np.testing.assert_allclose(out["pose"][:2], target, atol=0.1)
        assert abs(out["pose"][2]) < 1e-6
        # POSTed re-inits are DEFERRED to the next live tick (they queue
        # via request_initialize_pose so an in-flight live-loop state
        # commit can't overwrite them — ADVICE round 3); tick to apply
        node.update()
        cloud = np.asarray(node.state.particles)
        assert np.linalg.norm(cloud[:, :2].mean(0) - target) < 0.3

        # upward drag => heading ~ +pi/2 (image v is flipped)
        code, out = _post(
            viz, "/initialpose",
            dict(u0=u0, v0=v0, u1=u0, v1=v0 - 30.0),
        )
        assert abs(out["pose"][2] - np.pi / 2) < 1e-6

    def test_world_coord_pose_and_global(self, served):
        node, viz = served
        code, out = _post(
            viz, "/initialpose", dict(x=8.0, y=9.0, theta=0.7)
        )
        assert code == 200 and out["pose"] == [8.0, 9.0, 0.7]
        node.update()  # deferred re-inits apply at the next tick
        spread_seeded = np.asarray(node.state.particles)[:, 0].std()
        code, _ = _post(viz, "/global")
        assert code == 200
        node.update()
        spread_global = np.asarray(node.state.particles)[:, 0].std()
        assert spread_global > 3 * spread_seeded  # cloud spans the map again

    def test_bad_requests(self, served):
        _, viz = served
        try:
            _post(viz, "/initialpose", dict(u0=1.0))  # missing coords
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _get(viz, "/nope")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_reinit_is_deferred_to_the_loop_thread(self, served):
        """A POSTed re-init must not mutate node.state from the HTTP
        thread (it would race the live loop's state commit); it queues and
        applies at the top of the next update() tick (ADVICE round 3)."""
        node, viz = served
        before = np.asarray(node.state.particles).copy()
        code, _ = _post(viz, "/initialpose", dict(x=5.0, y=5.0, theta=0.1))
        assert code == 200
        # the HTTP handler returned but the state is untouched until a tick
        np.testing.assert_array_equal(np.asarray(node.state.particles), before)
        assert node._pending_reinit is not None
        node.update()
        assert node._pending_reinit is None
        cloud = np.asarray(node.state.particles)
        assert np.linalg.norm(cloud[:, :2].mean(0) - [5.0, 5.0]) < 0.3

    def test_state_json_survives_deleted_buffer(self, served):
        """/state.json must serve the last-known log quality instead of
        500ing when the live loop has donated the state buffer away
        (ADVICE round 3 — the same race _render() already guards)."""
        node, viz = served

        class Deleted:
            """Mimics a donated jax array: any read raises."""
            @property
            def particles(self):
                raise RuntimeError("buffer was deleted")

            @property
            def log_quality(self):
                raise RuntimeError("buffer was deleted")

            def weights(self):
                raise RuntimeError("buffer was deleted")

        # seed a known-good value first
        code, body, _ = _get(viz, "/state.json")
        assert code == 200
        node.state = Deleted()
        code, body, _ = _get(viz, "/state.json")
        assert code == 200
        s = json.loads(body)
        assert np.isfinite(s["log_quality"])

    def test_px_world_roundtrip(self, served):
        _, viz = served
        for xy in ([3.2, 4.1], [10.0, 10.0], [0.6, 17.3]):
            (u, v), = world_to_px(viz.gm, np.asarray(xy)[None], viz.scale)
            x, y = viz._px_to_world(u, v)
            np.testing.assert_allclose([x, y], xy, atol=1e-6)
