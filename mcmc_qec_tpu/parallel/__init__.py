from .mesh import make_mesh, pad_to_multiple, replicate, shard_batch
from .multihost import (
    allgather_rows,
    distributed_generate,
    global_sum,
    host_shard,
    init_distributed,
)
