from .mesh import data_sharding, make_mesh, replicated
from .sharding import param_spec, place_params, shard_params, shard_train_state

__all__ = [
    "data_sharding",
    "make_mesh",
    "param_spec",
    "place_params",
    "replicated",
    "shard_params",
    "shard_train_state",
]
