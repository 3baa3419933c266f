from .mesh import make_mesh, pad_to_multiple, replicate, shard_batch
