from cavmd_tpu.parallel.mesh import make_mesh, pad_snapshot_to, state_shardings
from cavmd_tpu.parallel.replicas import (
    init_replica_states,
    make_replica_step,
    run_replica_steps,
    split_replica_obs,
)
from cavmd_tpu.parallel.shard import (
    make_sharded_runner,
    make_sharded_step,
    shard_state,
)

__all__ = [
    "make_mesh",
    "pad_snapshot_to",
    "state_shardings",
    "init_replica_states",
    "make_replica_step",
    "run_replica_steps",
    "split_replica_obs",
    "make_sharded_runner",
    "make_sharded_step",
    "shard_state",
]
