from monte_carlo_localization_tpu.utils import geometry, validation
from monte_carlo_localization_tpu.utils.timing import TimingStats, device_trace

__all__ = ["geometry", "validation", "TimingStats", "device_trace"]
