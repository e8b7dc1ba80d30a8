"""Pallas TPU kernels for the hot ops (SURVEY.md §2.4): the fused residual
block (the №1 hot pattern — 9 blocks × 2 convs at 64×64×4·ngf)."""

from gan_variant_research_tpu.ops.pallas.resblock import (
    fused_resblock,
    resblock_reference,
    resblock_supported,
)

__all__ = ["fused_resblock", "resblock_reference", "resblock_supported"]
