from tpufusion.geometry.range_view import range_view_project, project_to_pixels
from tpufusion.geometry.bev import bev_rasterize
from tpufusion.geometry.boxes import (
    project_2d,
    box_corners_3d,
    sorted_projected_corners,
    outer_rect,
    inner_rect,
)

__all__ = [
    "range_view_project",
    "project_to_pixels",
    "bev_rasterize",
    "project_2d",
    "box_corners_3d",
    "sorted_projected_corners",
    "outer_rect",
    "inner_rect",
]
