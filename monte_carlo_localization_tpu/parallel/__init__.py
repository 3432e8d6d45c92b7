from monte_carlo_localization_tpu.parallel.fleet import (
    FleetFilter,
    FleetState,
    stack_maps,
)
from monte_carlo_localization_tpu.parallel.multihost import (
    MultiHostFleet,
    init_multihost,
    multihost_mesh,
)
from monte_carlo_localization_tpu.parallel.sharded import ShardedParticleFilter

__all__ = [
    "FleetFilter",
    "FleetState",
    "stack_maps",
    "ShardedParticleFilter",
    "MultiHostFleet",
    "init_multihost",
    "multihost_mesh",
]
