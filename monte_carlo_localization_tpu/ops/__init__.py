from monte_carlo_localization_tpu.ops.raycast import (
    cast_rays,
    cast_rays_dda,
    cast_rays_sphere,
)
from monte_carlo_localization_tpu.ops.resample import (
    multinomial_resample_indices,
    resample_rows,
    systematic_resample_indices,
    systematic_resample_rows,
)

__all__ = [
    "cast_rays",
    "cast_rays_dda",
    "cast_rays_sphere",
    "multinomial_resample_indices",
    "resample_rows",
    "systematic_resample_indices",
    "systematic_resample_rows",
]
