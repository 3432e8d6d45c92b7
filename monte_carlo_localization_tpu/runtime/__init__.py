from monte_carlo_localization_tpu.runtime.checkpoint import (
    load_fleet_state,
    load_state,
    save_fleet_state,
    save_state,
)
from monte_carlo_localization_tpu.runtime.fleet_node import FleetNode
from monte_carlo_localization_tpu.runtime.loop import LiveRunner
from monte_carlo_localization_tpu.runtime.node import MCLNode
from monte_carlo_localization_tpu.runtime.sinks import (
    CallbackSink,
    JsonlSink,
    NpzSink,
    Sink,
)
from monte_carlo_localization_tpu.runtime.tracker import OdometryTracker
from monte_carlo_localization_tpu.runtime.ros2_bridge import ROS2Bridge
from monte_carlo_localization_tpu.runtime.viz import VizSink, map_image, render_frame
from monte_carlo_localization_tpu.runtime.webviz import WebViz
from monte_carlo_localization_tpu.runtime.trace import (
    HostRaycaster,
    Trace,
    TraceReader,
    TraceWriter,
    synthesize_trace,
)

__all__ = [
    "OdometryTracker",
    "MCLNode",
    "FleetNode",
    "LiveRunner",
    "Sink",
    "CallbackSink",
    "JsonlSink",
    "NpzSink",
    "VizSink",
    "WebViz",
    "ROS2Bridge",
    "map_image",
    "render_frame",
    "Trace",
    "TraceReader",
    "TraceWriter",
    "synthesize_trace",
    "HostRaycaster",
    "save_state",
    "load_state",
    "save_fleet_state",
    "load_fleet_state",
]
