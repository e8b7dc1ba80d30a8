"""Everything-on variant stack under GSPMD: one full CUT train step on the
8-device virtual CPU mesh with every restored deleted feature active at
nonzero weight (VERDICT r3 next #4, second half).

The reference deleted these features in its baseline reversion
(Documentation/BASELINE_REVERSION.md:8-30) but kept their config surface;
this repo restored each as a working TPU-first opt-in. Their single-device
composition is proven by scripts/variant_smoke.py; THIS test proves the
combined step also compiles and runs data-parallel:

  - self-attention + channel attention + style dropout in the generator
    (per-sample stochastic blend keys must shard with the batch),
  - feature matching (the D concat-forward over [real; fake]),
  - Lab palette prior (batch-statistics loss -> cross-device moments),
  - k-NN repulsion against a REPLICATED feature bank (the bank is placed
    with a replicated out_sharding at trainer build; the sharded fake
    batch is embedded and hinge-matched against it inside the step),
  - lazy R1 double-backward, identity warmup, EMA -- the full step.

Marked slow: an 8-virtual-device collective step on this 1-core CI host
takes tens of seconds (see tests/test_cut_trainer.py note).
"""

from pathlib import Path

import numpy as np
import pytest
import jax

from gan_variant_research_tpu.train.cut_trainer import CUTTrainer
from gan_variant_research_tpu.train.feature_bank import save_feature_bank

from tests.test_cut_trainer import tiny_config


@pytest.mark.slow
def test_variant_stack_dp_step_on_8_devices(tmp_path, rng):
    bank = rng.normal(size=(16, 2048)).astype(np.float32)
    save_feature_bank(tmp_path / "bank.npz", bank)
    config = tiny_config(
        parallel={"num_devices": 8},
        batch_size=8,                       # one sample per device
        model={
            "generator": {
                "ngf": 4, "n_blocks": 2,
                "use_attention": True, "attn_layers": [0],
                "use_channel_attn": True, "channel_attn_layers": [1],
                "use_style_dropout": True,
            },
            "discriminator": {"ndf": 4, "n_layers": 2, "num_scales": 1},
        },
        loss_weights={
            "adv": 1.0, "patchnce": 1.0,
            "identity_warm": 0.1, "identity_final": 0.0,
            "featmatch": 1.0, "palette": 0.5, "repulsion": 0.2,
        },
        # margin far above any cosine distance -> hinge active (nonzero)
        repulsion={"enabled": True, "margin": 2.0},
        clip_features={"monet_feats_path": str(tmp_path / "bank.npz"),
                       "allow_random": True},
        r1={"gamma": 10.0, "every": 1},     # R1 branch in the single step
    )
    trainer = CUTTrainer(config)
    assert trainer.mesh.mesh.devices.size == 8
    # the bank must be replicated over the whole mesh, not batch-sharded
    assert trainer._repulsion is not None
    assert trainer._repulsion["bank"].sharding.is_fully_replicated
    # cheap projection instead of the frozen Inception embedder so the
    # 8-device CPU step stays inside CI budget; the real embedder is
    # covered by tests/test_repulsion.py::test_embed_fn and the on-chip
    # variant convergence run (docs/variant_convergence.md)
    proj = np.asarray(rng.normal(size=(3, 2048)), np.float32)
    trainer._repulsion["embed"] = (
        lambda x: jax.numpy.mean(x.astype(jax.numpy.float32), axis=(1, 2))
        @ proj)

    state = trainer.init_state()
    # every variant module must exist in the GSPMD-sharded param tree
    mods = set(state.g_params)
    assert {"attn_0", "channel_attn_1"} <= mods, sorted(mods)
    assert any(m.startswith("style_gate_") for m in mods), sorted(mods)

    photos = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    monets = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    state, losses = trainer.train_step(state, photos, monets)

    vals = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # every restored loss actually contributed under the 8-way sharding
    assert vals["featmatch"] > 0, vals
    assert vals["palette"] > 0, vals
    assert vals["repulsion"] > 0, vals
    assert vals["r1"] > 0, vals
    assert int(state.step) == 1
