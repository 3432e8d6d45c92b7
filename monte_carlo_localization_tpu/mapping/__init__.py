from monte_carlo_localization_tpu.mapping.grid_map import (
    GridMap,
    load_map,
    map_from_occupancy,
    occupancy_from_image,
)
from monte_carlo_localization_tpu.mapping.edt import euclidean_distance_transform
from monte_carlo_localization_tpu.mapping.synthetic import (
    box_world,
    corridor_world,
    random_obstacle_world,
)

__all__ = [
    "GridMap",
    "load_map",
    "map_from_occupancy",
    "occupancy_from_image",
    "euclidean_distance_transform",
    "box_world",
    "corridor_world",
    "random_obstacle_world",
]
