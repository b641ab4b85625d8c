from .mesh import MeshConfig, create_mesh, shard_dual_ar_params, shard_batch

__all__ = ["MeshConfig", "create_mesh", "shard_dual_ar_params", "shard_batch"]
