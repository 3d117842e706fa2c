from teal_tpu.parallel.mesh import make_mesh
from teal_tpu.parallel.tp import shard_params, shard_cache, param_specs
from teal_tpu.parallel.pp import (make_pp_mesh, pp_forward, pp_shard_cache,
                                  pp_shard_params)
from teal_tpu.parallel.sp import make_sp_mesh, sp_prefill
from teal_tpu.parallel.tp_kernel import (make_tp_mesh,
                                         tp_kernel_decode)

__all__ = ["make_mesh", "shard_params", "shard_cache", "param_specs",
           "make_pp_mesh", "pp_forward", "pp_shard_cache", "pp_shard_params",
           "make_sp_mesh", "sp_prefill", "make_tp_mesh",
           "tp_kernel_decode"]
