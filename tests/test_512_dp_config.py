"""The 512² data-parallel stretch config must compile and run end-to-end on
the 8-device virtual mesh (VERDICT round-1 item 7; BASELINE.json config 5).

Loads the real ``train_gan_cutpp_512.yaml`` (so its keys stay validated
against the schema), shrinks only capacity knobs (channels/blocks/patches)
to fit the CI host, and runs ONE full train step — R1 double-backward
included — at image_size=512 with the batch sharded over all 8 devices.
"""

from pathlib import Path

import numpy as np
import pytest
import jax

from gan_variant_research_tpu.core.config import (
    CUT_SCHEMA,
    load_config,
    override_config,
    validate_config,
)
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

CFG_512 = (Path(__file__).parent.parent / "gan_variant_research_tpu" / "configs"
           / "train_gan_cutpp_512.yaml")


@pytest.mark.slow
def test_512_dp_step_on_8_devices(rng):
    config = load_config(CFG_512)
    config = override_config(config, [
        # capacity only — resolution, parallelism, loss cadence stay real
        "model.generator.ngf=2",
        "model.generator.n_blocks=1",
        "model.discriminator.ndf=2",
        "model.discriminator.n_layers=2",
        "patchnce.num_patches=8",
        "batch_size=8",
        "r1.every=1",          # exercise the R1 branch in the single step
        "runtime.precision=fp32",
        # the shipped config turned remat OFF (measured pure overhead at
        # 512², docs/PERF.md capacity table) — force it on here so the
        # remat'd-trunk train path stays covered on the 8-device mesh
        "model.generator.remat=true",
    ])
    validate_config(config, CUT_SCHEMA, strict=True)
    assert config["image_size"] == 512
    assert config["model"]["generator"]["remat"] is True

    trainer = CUTTrainer(config)
    assert trainer.mesh.mesh.devices.size == 8

    state = trainer.init_state()
    photos = rng.integers(0, 256, (8, 512, 512, 3), dtype=np.uint8)
    monets = rng.integers(0, 256, (8, 512, 512, 3), dtype=np.uint8)

    sharded = jax.device_put(photos, trainer.mesh.batch_sharding(4))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (1, 512, 512, 3)

    state, losses = trainer.train_step(state, sharded,
                                       jax.device_put(monets,
                                                      trainer.mesh.batch_sharding(4)))
    host = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in host.values()), host
    assert host["r1"] > 0.0  # the lazy-R1 second D step really ran
    assert int(state.step) == 1
    # params stay replicated across the mesh after the sharded step
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated
