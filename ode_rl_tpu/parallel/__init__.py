from ode_rl_tpu.parallel.mesh import (
    make_mesh, shard_batch, shard_pytree, replicate, data_parallel_sharding,
)
from ode_rl_tpu.parallel.sp import make_sp_mesh, shard_batch_sp
