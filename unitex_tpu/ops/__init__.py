from .rasterize import Rast, rasterize, rasterize_uv, interpolate
from .grid_sample import grid_sample
from .knn import knn
from .raytrace import ray_triangle_intersect
