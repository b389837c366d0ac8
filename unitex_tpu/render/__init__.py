from .renderer import RenderOutputs, render_views
from .conditioning import (
    render_geometry_condition,
    views_to_grid,
    grid_to_views,
    grid_to_strip,
    strip_to_grid,
)
