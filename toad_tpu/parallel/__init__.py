from toad_tpu.parallel.mesh import make_mesh, mesh_shape_for
from toad_tpu.parallel.sharding import batch_shardings, shard_batch, replicate

__all__ = ["make_mesh", "mesh_shape_for", "batch_shardings", "shard_batch", "replicate"]
