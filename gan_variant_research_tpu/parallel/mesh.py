"""Device mesh and sharding helpers.

One small module routes all cross-device communication (SURVEY.md §2.4):
params/optimizer state are replicated, batches are sharded along the
``data`` axis, and gradient reduction happens inside jit via XLA collectives
(`jax.lax.pmean` under `shard_map`, riding ICI). Works unchanged on a
single device — the mesh is just 1-wide and the collectives are no-ops.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus its canonical shardings for DP training."""

    mesh: Mesh
    data_axis: str = DATA_AXIS

    @property
    def num_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def batch_spec(self, ndim: int) -> P:
        """Shard the leading (batch) dim, replicate the rest."""
        return P(self.data_axis, *([None] * (ndim - 1)))

    def batch_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec(ndim))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def init_distributed(enable: bool | str = "auto") -> bool:
    """Multi-host entry hook (SURVEY.md §5 "Distributed communication
    backend": ``jax.distributed.initialize()`` + DCN across hosts, ICI
    within). Idempotent; returns True iff a multi-process runtime is active.

    ``enable="auto"`` initializes only when a multi-host launcher's
    coordinator environment is present (Cloud TPU pods export it; JAX
    auto-detects its own coordinates there), so single-host runs — and this
    repo's tests — are untouched. After initialization ``jax.devices()`` is
    global, which is exactly what ``create_mesh`` consumes. The input
    pipeline is multi-host-aware: each process decodes only its
    ``process_batch_bounds`` slice of the global batch and assembles the
    global array from per-device local transfers
    (``jax.make_array_from_single_device_arrays`` — see
    ``UnpairedLoader._stage`` for why the process-local-data helper is
    avoided on the producer thread), so every host sees distinct data.
    """
    import os

    if enable is False:
        return False
    if not (enable is True or enable == "auto"):
        raise ValueError(
            f"parallel.multihost must be true, false or 'auto', got {enable!r}"
        )
    want = enable is True or any(
        k in os.environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    # NOTE: must not touch the backend (jax.devices()/process_count()) before
    # initialize() — that would itself initialize XLA and make initialize()
    # raise. is_initialized() is safe.
    if not jax.distributed.is_initialized():
        jax.distributed.initialize()
    return jax.process_count() > 1


def process_batch_bounds(ctx: MeshContext, global_batch: int) -> tuple[int, int]:
    """[lo, hi) rows of a batch-sharded global array owned by THIS process.

    Derived from the sharding itself (``devices_indices_map``), not from an
    assumed device ordering, so it stays correct for any process→device
    layout. The loaders decode exactly this slice and assemble the global
    array from per-device local transfers (``UnpairedLoader._stage``);
    single-process this is the full batch, so one code path serves both. The per-process rows must be
    contiguous (true for a 1-D data mesh built over ``jax.devices()``, whose
    order groups devices by process).
    """
    sharding = ctx.batch_sharding(1)
    imap = sharding.devices_indices_map((global_batch,))
    bounds = sorted(
        (idx[0].start or 0,
         global_batch if idx[0].stop is None else idx[0].stop)
        for d, idx in imap.items() if d.process_index == jax.process_index()
    )
    if not bounds:
        raise RuntimeError("This process owns no shard of the batch axis")
    lo, hi = bounds[0][0], bounds[-1][1]
    for (a0, a1), (b0, b1) in zip(bounds, bounds[1:]):
        if a1 != b0:
            raise RuntimeError(
                f"Non-contiguous per-process batch rows {bounds}; the data "
                "mesh must keep each process's devices adjacent on the batch "
                "axis for sliced host loading"
            )
    return lo, hi


def assert_agreement_across_processes(value: int, what: str) -> None:
    """Raise everywhere if an integer decision differs across processes.

    Multi-host resume is the motivating case: each process resolves the
    resume checkpoint from ITS filesystem, and a pod without a shared
    checkpoint directory can have host 0 find ``ckpt_step1000`` while host 1
    finds nothing. Divergent ``start_step`` values are not merely wrong data
    — the hosts fast-forward their loaders differently, pick different
    static step variants (R1/identity cadence branches), and exit the train
    loop at different times, leaving the stragglers hung in a collective.
    One cheap allgather at startup turns that silent hang into an
    actionable error. No-op single-process.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    vals = np.asarray(
        multihost_utils.process_allgather(np.int64(value))).reshape(-1)
    if not (vals == vals[0]).all():
        raise RuntimeError(
            f"{what} disagrees across processes: "
            f"{ {i: int(v) for i, v in enumerate(vals)} }. Every host must "
            "resolve the same resume point — use a shared (or identically "
            "synced) checkpoint directory on all hosts."
        )


def validate_donation(donate: bool) -> bool:
    """Gate ``runtime.donate`` on backends where it is measured-broken.

    Donating the train-state buffers halves peak HBM, but (measured in
    round 2, docs/PERF.md "lever audit"): the XLA **CPU** backend deadlocks
    its collective rendezvous when donation meets GSPMD sharding, and the
    **axon**-tunneled TPU fails executions with an async InvalidArgument.
    Rather than parse silently and fail later (or never — the knob used to
    be an unverifiable no-op promise), raise here with the reason so the
    config surface stays honest. Returns ``donate`` unchanged on healthy
    backends (a real TPU VM).
    """
    if not donate:
        return False
    import os

    platform = jax.devices()[0].platform.lower()
    via_axon = "axon" in (os.environ.get("JAX_PLATFORMS") or "").lower()
    if platform == "cpu" or via_axon:
        which = "the axon-tunneled TPU" if via_axon else "the XLA CPU backend"
        why = ("async InvalidArgument on execute" if via_axon
               else "collective-rendezvous deadlock under GSPMD sharding")
        raise RuntimeError(
            f"runtime.donate=true is not supported on {which} ({why}, "
            "measured round 2 — docs/PERF.md). Donation is also speed-neutral "
            "here (240 ms/step both ways); it only buys peak-HBM headroom on "
            "a real multi-chip TPU VM. Set runtime.donate=false."
        )
    return True


def create_mesh(
    num_devices: int | None = None,
    data_axis: str = DATA_AXIS,
    devices: list | None = None,
) -> MeshContext:
    """Create a 1-D data-parallel mesh over the local devices.

    ``num_devices=None`` takes every available device; an explicit count must
    divide into what is available (uses a prefix).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    mesh = Mesh(np.asarray(devices), (data_axis,))
    return MeshContext(mesh=mesh, data_axis=data_axis)


def batch_sharding(ctx: MeshContext, ndim: int) -> NamedSharding:
    return ctx.batch_sharding(ndim)


def replicated_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.replicated()


def shard_batch(ctx: MeshContext, batch):
    """Place a host array tree onto the mesh, sharded along the batch dim."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, ctx.batch_sharding(np.ndim(x))), batch
    )


def replicate(ctx: MeshContext, tree):
    """Place a host array tree onto the mesh fully replicated."""
    sharding = ctx.replicated()
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
