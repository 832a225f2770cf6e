"""Multi-device execution: meshes, sharded operators, streaming."""

from .dist_join import distributed_join
from .mesh import DATA_AXIS, data_mesh, replicated, row_sharding
from .sharded import run_expression_sharded, run_grouped_sharded, shard_table
from .shuffle import shuffle_grouped
from .streaming import run_streaming_csv

__all__ = [
    "DATA_AXIS",
    "data_mesh",
    "replicated",
    "row_sharding",
    "run_expression_sharded",
    "run_grouped_sharded",
    "shard_table",
    "shuffle_grouped",
    "distributed_join",
    "run_streaming_csv",
]
