from lav_tpu.core.geometry import (  # noqa: F401
    transform_points,
    rotate_points_deg,
    rotate_lidar_deg,
    move_lidar_points,
    latlon_to_xy,
)
from lav_tpu.core.warp import affine_grid, grid_sample, crop_feature  # noqa: F401
from lav_tpu.core.heatmap import detections_to_heatmap  # noqa: F401
