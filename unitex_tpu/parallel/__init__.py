from .mesh import make_mesh
from .sharding import flux_param_shardings, shard_params, data_sharding
