from .mesh import make_mesh
from .pipeline import pad_stacked_blocks, pipeline_apply, pipeline_apply_chain
from .sharding import flux_param_shardings, shard_params, data_sharding
