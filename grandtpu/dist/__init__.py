"""Distribution layer: device meshes, sharded training, partitioned SpMM.

The reference is single-process/single-GPU (SURVEY.md §2.3-2.4); this layer
is new capability, built the TPU way: ``jax.sharding.Mesh`` +
``NamedSharding`` annotations for GSPMD-auto-sharded training (XLA inserts
the psums), and explicit ``shard_map`` + collectives for the row-partitioned
full-graph propagation where we control the halo exchange.
"""

from grandtpu.dist.mesh import make_mesh  # noqa: F401
from grandtpu.dist.data_parallel import (  # noqa: F401
    shard_sparse_train_inputs, shard_train_inputs,
)
from grandtpu.dist.spmm_shard import (  # noqa: F401
    BlockShardedGraph, BlockShardedPropagator, ShardedGraph,
    ShardedPropagator, dist_exact_propagate, sharded_propagate,
)
from grandtpu.dist.push import (  # noqa: F401
    multihost_native_gfpush, push_source_shard, sharded_gfpush,
)
from grandtpu.dist.halo import (  # noqa: F401
    HaloPropagator, HaloShardedGraph, estimate_halo_compression,
)
