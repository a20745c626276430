"""Device mesh + sharding rules (DP/FSDP/TP over ICI; XLA collectives)."""

from unimp_tpu.parallel.mesh import make_mesh, init_distributed
from unimp_tpu.parallel.seq_shard import (
    sequence_sharding,
    set_sequence_sharding,
    get_sequence_sharding,
)
from unimp_tpu.parallel.sharding import (
    param_sharding,
    batch_sharding,
    partition_rules,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "param_sharding",
    "batch_sharding",
    "partition_rules",
    "sequence_sharding",
    "set_sequence_sharding",
    "get_sequence_sharding",
]
