from .rasterize import Rast, rasterize, rasterize_uv, interpolate
from .grid_sample import grid_sample
from .knn import knn, query_ball
from .raytrace import ray_triangle_intersect
from .closest_point import ClosestPoint, closest_point_on_mesh
from .visibility import self_rt, cross_rt, sphere_rt, sphere_rt_views
