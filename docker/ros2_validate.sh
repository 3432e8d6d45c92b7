#!/bin/bash
# Real-DDS validation of the ROS2 bridge (run inside docker/Dockerfile).
#
#   ros2_validate.sh smoke    bridge node <-> trace player over DDS (default)
#   ros2_validate.sh launch   same, but the bridge comes up through
#                             launch/tpu_mcl_launch.py (use_rviz:=false)
#
# Exit code 0 = the bridge consumed real /scan + /odom messages and
# published /pf/viz/inferred_pose poses within the RMSE threshold.
set -euo pipefail
source /opt/ros/humble/setup.bash
cd /opt/tpu_mcl

MODE="${1:-smoke}"
MAP="maps/map_1753950572.yaml"
CONFIG="config/mcl_config.yaml"
TRACE="traces/config1_map_1753950572.npz"

cleanup() {
    [[ -n "${BRIDGE_PID:-}" ]] && kill "$BRIDGE_PID" 2>/dev/null || true
}
trap cleanup EXIT

if [[ "$MODE" == "launch" ]]; then
    ros2 launch launch/tpu_mcl_launch.py \
        "map_yaml:=$PWD/$MAP" "config:=$PWD/$CONFIG" use_rviz:=false &
    BRIDGE_PID=$!
else
    python3 -m monte_carlo_localization_tpu.runtime.ros2_bridge \
        --map "$MAP" --config "$CONFIG" &
    BRIDGE_PID=$!
fi

# the player waits for the bridge's latched /map before streaming
python3 docker/ros2_smoke.py --trace "$TRACE" --rmse-max 0.5 \
    --min-corrections 20
echo "ROS2 validation ($MODE): OK"
