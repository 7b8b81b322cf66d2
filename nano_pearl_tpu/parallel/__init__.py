from nano_pearl_tpu.parallel.mesh import GroupMesh, build_group_meshes
from nano_pearl_tpu.parallel.sharding import param_shardings, kv_cache_sharding

__all__ = ["GroupMesh", "build_group_meshes", "param_shardings", "kv_cache_sharding"]
