"""Mesh / collective layer for data-parallel scale-out.

The reference is single-process, single-device (SURVEY.md §2.4: no
torch.distributed/NCCL/MPI anywhere). This module is the TPU-native layer
the rebuild adds: a `jax.sharding.Mesh` over ICI with named shardings for
batch data-parallelism, degrading transparently to a 1-chip mesh so
single-device behavior matches the reference.
"""

from gan_variant_research_tpu.parallel.mesh import (
    MeshContext,
    assert_agreement_across_processes,
    create_mesh,
    init_distributed,
    process_batch_bounds,
    validate_donation,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    DATA_AXIS,
)

__all__ = [
    "MeshContext",
    "assert_agreement_across_processes",
    "create_mesh",
    "init_distributed",
    "process_batch_bounds",
    "validate_donation",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "DATA_AXIS",
]
