from layerskip_tpu.parallel.distributed import is_coordinator, setup
from layerskip_tpu.parallel.mesh import make_mesh, single_device_mesh
from layerskip_tpu.parallel.sharding import (
    activation_spec,
    batch_spec,
    kv_cache_spec,
    param_specs,
    shard_params,
    to_named,
)

__all__ = [
    "activation_spec", "batch_spec", "is_coordinator", "kv_cache_spec",
    "make_mesh", "param_specs", "setup", "shard_params",
    "single_device_mesh", "to_named",
]
