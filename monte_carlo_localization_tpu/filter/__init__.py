from monte_carlo_localization_tpu.filter.core import (
    MCLState,
    ParticleFilter,
    expected_pose,
    mcl_step,
)
from monte_carlo_localization_tpu.filter.init import (
    initialize_global,
    initialize_pose,
)

__all__ = [
    "MCLState",
    "ParticleFilter",
    "expected_pose",
    "mcl_step",
    "initialize_global",
    "initialize_pose",
]
