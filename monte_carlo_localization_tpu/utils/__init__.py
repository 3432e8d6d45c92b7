from monte_carlo_localization_tpu.utils import geometry, validation
from monte_carlo_localization_tpu.utils.timing import TimingStats

__all__ = ["geometry", "validation", "TimingStats"]
