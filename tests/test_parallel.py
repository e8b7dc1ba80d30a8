"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gan_variant_research_tpu.parallel import create_mesh, shard_batch, replicate


def test_mesh_has_eight_devices():
    ctx = create_mesh()
    assert ctx.num_devices == 8


def test_mesh_subset():
    ctx = create_mesh(num_devices=4)
    assert ctx.num_devices == 4


def test_shard_batch_and_replicate(rng):
    ctx = create_mesh()
    x = rng.standard_normal((16, 4, 4, 3)).astype(np.float32)
    sx = shard_batch(ctx, x)
    assert sx.shape == (16, 4, 4, 3)
    # each device holds 2 rows of the batch
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (2, 4, 4, 3)
    w = replicate(ctx, np.ones((3, 3), np.float32))
    assert w.addressable_shards[0].data.shape == (3, 3)


def test_psum_mean_over_mesh(rng):
    ctx = create_mesh()
    x = rng.standard_normal((8, 4)).astype(np.float32)

    def local_mean(xs):
        return jax.lax.pmean(jnp.mean(xs), axis_name=ctx.data_axis)

    f = shard_map(
        local_mean,
        mesh=ctx.mesh,
        in_specs=P(ctx.data_axis, None),
        out_specs=P(),
    )
    got = float(f(x))
    assert abs(got - float(x.mean())) < 1e-6


def test_single_device_mesh_degrades():
    ctx = create_mesh(num_devices=1)
    x = np.ones((4, 2), np.float32)
    sx = shard_batch(ctx, x)
    assert len(sx.addressable_shards) == 1


def test_init_distributed_single_host_noop():
    """init_distributed must be a safe no-op outside a multi-host launcher
    (enable=False and auto-without-coordinator), and idempotent."""
    from gan_variant_research_tpu.parallel import init_distributed

    assert init_distributed(False) is False
    assert init_distributed("auto") is False  # no coordinator env here
    assert init_distributed("auto") is False


def test_init_distributed_rejects_bad_strings():
    from gan_variant_research_tpu.parallel import init_distributed

    with pytest.raises(ValueError, match="multihost"):
        init_distributed("atuo")
    with pytest.raises(ValueError, match="multihost"):
        init_distributed("true")  # quoted-string YAML mistake


def test_agreement_helper_single_process_noop():
    from gan_variant_research_tpu.parallel.mesh import (
        assert_agreement_across_processes,
    )

    assert_agreement_across_processes(1234, "resume start_step")  # no raise


def test_agreement_helper_raises_on_divergence(monkeypatch):
    """Simulated 2-process divergence: host 1 resolved a different resume
    step than host 0 — must be an actionable error, not a collective hang."""
    import numpy as np

    import gan_variant_research_tpu.parallel.mesh as mesh_mod
    from jax.experimental import multihost_utils

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda v: np.array([1000, 0], np.int64))
    with pytest.raises(RuntimeError, match="disagrees across processes"):
        mesh_mod.assert_agreement_across_processes(1000, "resume start_step")

    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda v: np.array([1000, 1000], np.int64))
    mesh_mod.assert_agreement_across_processes(1000, "resume start_step")
