"""Device-mesh / sharding layer.

The reference is single-GPU with no distributed code (SURVEY §2.6); for the
TPU framework parallelism is a first-class new component: a 1-D ``data``
mesh over all chips (ICI within a slice, DCN across slices), batch-sharded
inputs, replicated parameters, and gradient all-reduce inserted by XLA's
SPMD partitioner under jit.  Multi-host feeding goes through
``jax.make_array_from_process_local_data`` with each process loading a
disjoint slice (``data.iterate_batches(process_index=...)``).

TP/PP/SP have no payoff for 1-8M-parameter models on 48x48 stamps and are
explicitly out of scope (SURVEY §2.6); the scaling axis is the galaxy batch.
"""

from galaxy_deconv_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
