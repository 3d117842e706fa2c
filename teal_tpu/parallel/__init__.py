from teal_tpu.parallel.mesh import make_mesh
from teal_tpu.parallel.tp import shard_params, shard_cache, param_specs

__all__ = ["make_mesh", "shard_params", "shard_cache", "param_specs"]
