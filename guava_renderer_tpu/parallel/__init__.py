from .mesh import data_parallel_mesh, shard_batch  # noqa: F401
