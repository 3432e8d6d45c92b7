from monte_carlo_localization_tpu.models.sensor import (
    SensorModel,
    build_sensor_table,
)
from monte_carlo_localization_tpu.models.motion import motion_model, reconstruct_velocity

__all__ = [
    "SensorModel",
    "build_sensor_table",
    "motion_model",
    "reconstruct_velocity",
]
