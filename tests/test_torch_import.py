"""Torch-checkpoint importer: converted reference generator weights must
reproduce the torch forward bit-for-bit-ish (VERDICT round-1, missing #4).

``TorchRefGenerator`` below is a minimal torch mirror of the reference's
ResNetGenerator module layout (GAN_Variant1/models/generator_resnet_attn.py:
74-162) — its ``state_dict()`` has exactly the reference's key space
(``initial.1.weight``, ``res_blocks.i.conv_block.1/5.*``, ``upsample.0.*``…),
so the converter path tested here is the one a real reference ``.pt`` takes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gan_variant_research_tpu.cli.import_torch_checkpoint import (  # noqa: E402
    convert_generator_state_dict,
    generator_config_from_params,
    import_torch_checkpoint,
)
from gan_variant_research_tpu.core.precision import Policy  # noqa: E402
from gan_variant_research_tpu.train.cut_trainer import build_generator  # noqa: E402


def _pad1(padding_type):
    return nn.ReflectionPad2d(1) if padding_type == "reflect" else nn.ReplicationPad2d(1)


def _res_block(ch, padding_type="reflect"):
    # the reference ResidualBlock adds a pad module for BOTH reflect and
    # replicate (generator_resnet_attn.py:23-28), so convs sit at 1 and 5
    return nn.Sequential(
        _pad1(padding_type), nn.Conv2d(ch, ch, 3), nn.InstanceNorm2d(ch),
        nn.ReLU(True),
        _pad1(padding_type), nn.Conv2d(ch, ch, 3), nn.InstanceNorm2d(ch),
    )


class _Block(nn.Module):
    def __init__(self, ch, padding_type="reflect"):
        super().__init__()
        self.conv_block = _res_block(ch, padding_type)

    def forward(self, x):
        return x + self.conv_block(x)


class TorchRefGenerator(nn.Module):
    """Reference module layout (reflect/replicate padding, instance norm,
    biased convs). For replicate the stem/head Sequentials have NO pad module
    — the reference only inserts one for reflect and falls back to the conv's
    own zero padding=3 (generator_resnet_attn.py:110-113,157-160)."""

    def __init__(self, ngf=8, n_blocks=2, n_down=2, padding_type="reflect"):
        super().__init__()
        if padding_type == "reflect":
            stem = [nn.ReflectionPad2d(3), nn.Conv2d(3, ngf, 7)]
        else:
            stem = [nn.Conv2d(3, ngf, 7, padding=3)]
        self.initial = nn.Sequential(
            *stem, nn.InstanceNorm2d(ngf), nn.ReLU(True),
        )
        down = []
        for i in range(n_down):
            m = 2 ** i
            down += [nn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2, padding=1),
                     nn.InstanceNorm2d(ngf * m * 2), nn.ReLU(True)]
        self.downsample = nn.Sequential(*down)
        ch = ngf * 2 ** n_down
        self.res_blocks = nn.ModuleList(
            [_Block(ch, padding_type) for _ in range(n_blocks)])
        up = []
        for i in range(n_down):
            m = 2 ** (n_down - i)
            up += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, stride=2,
                                      padding=1, output_padding=1),
                   nn.InstanceNorm2d(ngf * m // 2), nn.ReLU(True)]
        self.upsample = nn.Sequential(*up)
        if padding_type == "reflect":
            head = [nn.ReflectionPad2d(3), nn.Conv2d(ngf, 3, 7)]
        else:
            head = [nn.Conv2d(ngf, 3, 7, padding=3)]
        self.output = nn.Sequential(*head, nn.Tanh())

    def forward(self, x):
        x = self.initial(x)
        x = self.downsample(x)
        for b in self.res_blocks:
            x = b(x)
        x = self.upsample(x)
        return self.output(x)


@pytest.fixture(scope="module")
def torch_gen():
    torch.manual_seed(0)
    return TorchRefGenerator().eval()


def test_forward_parity_through_converter(torch_gen, rng):
    params = convert_generator_state_dict(torch_gen.state_dict())
    gen_cfg = generator_config_from_params(params)
    assert gen_cfg == {"ngf": 8, "n_blocks": 2, "n_downsampling": 2,
                       "padding_type": "reflect", "use_bias": True}

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        y_t = torch_gen(torch.from_numpy(x).permute(0, 3, 1, 2))
    y_t = y_t.permute(0, 2, 3, 1).numpy()

    generator = build_generator(gen_cfg, Policy(compute_dtype=jnp.float32))
    y_j = np.asarray(generator.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5, rtol=1e-4)


def test_replicate_layout_forward_parity(rng):
    """--padding replicate checkpoints have the 7×7 convs at initial.0 /
    output.0 (no pad module in the stem/head Sequentials) while the res-block
    convs stay at conv_block.1/5 — the exact layout mix that used to crash
    the importer with KeyError 'initial.1.weight' (ADVICE r2, medium)."""
    torch.manual_seed(1)
    tg = TorchRefGenerator(padding_type="replicate").eval()
    sd = tg.state_dict()
    assert "initial.0.weight" in sd and "initial.1.weight" not in sd
    assert "res_blocks.0.conv_block.1.weight" in sd

    params = convert_generator_state_dict(sd, padding_type="replicate")
    gen_cfg = generator_config_from_params(params, padding_type="replicate")
    assert gen_cfg["padding_type"] == "replicate"

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        y_t = tg(torch.from_numpy(x).permute(0, 3, 1, 2))
    y_t = y_t.permute(0, 2, 3, 1).numpy()

    generator = build_generator(gen_cfg, Policy(compute_dtype=jnp.float32))
    y_j = np.asarray(generator.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5, rtol=1e-4)


def test_full_checkpoint_import_and_generate(torch_gen, tmp_path, rng):
    """Full flow: reference-schema .pt → msgpack → generate_folder loader,
    EMA-first."""
    gen_sd = torch_gen.state_dict()
    # EMA shadow with perturbed values so EMA-first selection is observable
    shadow = {k: v + 0.01 for k, v in gen_sd.items()}
    pt = tmp_path / "ckpt_step100.pt"
    torch.save({
        "step": 100,
        "generator": gen_sd,
        "discriminator": {},
        "opt_G": {}, "opt_D": {},
        "ema_G": {"decay": 0.999, "shadow": shadow},
        "metrics": {"d_loss": 0.5},
        "config": {"model": {"name": "cutpp"}},
    }, pt)

    out = tmp_path / "ckpt_step100.msgpack"
    import_torch_checkpoint(pt, out)

    from gan_variant_research_tpu.cli.generate_folder import load_generator_params

    generator, params, config = load_generator_params(str(out), use_ema=True)
    exp = convert_generator_state_dict(shadow)
    np.testing.assert_allclose(
        params["initial_conv"]["kernel"], exp["initial_conv"]["kernel"])
    # raw (non-EMA) selection returns the unperturbed weights
    _, raw, _ = load_generator_params(str(out), use_ema=False)
    exp_raw = convert_generator_state_dict(gen_sd)
    np.testing.assert_allclose(
        raw["initial_conv"]["kernel"], exp_raw["initial_conv"]["kernel"])
    # reconstructed generator runs on the imported params
    y = generator.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert y.shape == (1, 32, 32, 3)
    assert bool(np.isfinite(np.asarray(y)).all())


@pytest.mark.parametrize("layout", ["G_state_dict", "bare", "nested"])
def test_legacy_layouts_import(torch_gen, tmp_path, layout):
    """The reference inference CLI accepts several legacy checkpoint layouts
    (generate_folder.py:120-167 EXPECT_KEYS + raw/nested state-dict scans);
    the importer must take all of them."""
    gen_sd = torch_gen.state_dict()
    if layout == "G_state_dict":
        blob = {"G_state_dict": gen_sd, "step": 7}
    elif layout == "bare":
        blob = gen_sd
    else:
        blob = {"whatever": {k: v for k, v in gen_sd.items()}}
    pt = tmp_path / f"{layout}.pt"
    torch.save(blob, pt)
    out = tmp_path / f"{layout}.msgpack"
    import_torch_checkpoint(pt, out)

    from gan_variant_research_tpu.cli.generate_folder import load_generator_params

    _, params, _ = load_generator_params(str(out), use_ema=True)  # EMA absent → raw
    exp = convert_generator_state_dict(gen_sd)
    np.testing.assert_allclose(
        params["initial_conv"]["kernel"], exp["initial_conv"]["kernel"])


def test_metadata_dict_does_not_shadow_state_dict(torch_gen, tmp_path):
    """A config dict under an early fallback key (e.g. 'model') must not
    shadow the real tensor state dict under a later key."""
    blob = {"model": {"name": "cutpp", "ngf": 8},
            "state_dict": torch_gen.state_dict()}
    pt = tmp_path / "shadow.pt"
    torch.save(blob, pt)
    out = tmp_path / "shadow.msgpack"
    import_torch_checkpoint(pt, out)

    from gan_variant_research_tpu.cli.generate_folder import load_generator_params

    _, params, _ = load_generator_params(str(out), use_ema=False)
    exp = convert_generator_state_dict(torch_gen.state_dict())
    np.testing.assert_allclose(
        params["initial_conv"]["kernel"], exp["initial_conv"]["kernel"])


# ---- exporter (the inverse bridge) ----


def test_export_roundtrip_exact(torch_gen):
    """torch sd → import → export must reproduce every tensor bitwise —
    the transpose/flip inverses cancel exactly."""
    from gan_variant_research_tpu.cli.export_torch_checkpoint import (
        generator_params_to_state_dict,
    )

    sd = {k: v.numpy() for k, v in torch_gen.state_dict().items()}
    back = generator_params_to_state_dict(convert_generator_state_dict(sd))
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_trained_checkpoint_serves_reference_module(tmp_path, rng):
    """A checkpoint our CUT trainer actually wrote must export to a .pt
    whose state dict loads into the reference generator module with
    strict=True and reproduces our forward — the artifact a reference user
    needs to run OUR weights in THEIR torch pipeline."""
    from gan_variant_research_tpu.cli.export_torch_checkpoint import (
        export_torch_checkpoint,
    )
    from gan_variant_research_tpu.train.checkpoint import save_checkpoint
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    cfg = {
        "image_size": 32, "batch_size": 2, "max_steps": 1, "seed": 3,
        "warmup_steps": 1,
        "optim": {"G": {"lr": 2e-4, "betas": [0.5, 0.999]},
                  "D": {"lr": 2e-4, "betas": [0.5, 0.999]}},
        "loss_weights": {"adv": 1.0, "patchnce": 1.0,
                         "identity_warm": 0.1, "identity_final": 0.0},
        "model": {"generator": {"ngf": 8, "n_blocks": 2},
                  "discriminator": {"ndf": 4, "n_layers": 2, "num_scales": 1}},
        "patchnce": {"num_patches": 8, "temperature": 0.07,
                     "nce_layers": [0, 4, 8, 12, 16]},
        "r1": {"gamma": 10.0, "every": 4},
        "ema": {"decay": 0.999},
        "runtime": {"precision": "fp32"},
        "parallel": {"num_devices": 1},
    }
    trainer = CUTTrainer(cfg)
    state = trainer.init_state()
    ckpt = tmp_path / "ours.msgpack"
    save_checkpoint(ckpt, 0, trainer.checkpoint_payload(state), config=cfg)

    pt = export_torch_checkpoint(ckpt, tmp_path / "ours.pt")
    blob = torch.load(pt, map_location="cpu", weights_only=False)
    assert blob["ema_G"]["decay"] == pytest.approx(0.999)

    tg = TorchRefGenerator(ngf=8, n_blocks=2, n_down=2)
    missing = tg.load_state_dict(blob["generator"], strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys
    tg.eval()

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        y_t = tg(torch.from_numpy(x).permute(0, 3, 1, 2))
    y_t = y_t.permute(0, 2, 3, 1).numpy()
    y_j = np.asarray(trainer.generator.apply(
        {"params": state.g_params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5, rtol=1e-4)


def test_export_rejects_variant_params():
    """Attention/style-gate params have no slot in the reference's baseline
    state_dict; exporting them must fail loudly instead of silently writing
    a generator that produces different images."""
    from gan_variant_research_tpu.cli.export_torch_checkpoint import (
        generator_params_to_state_dict,
    )
    from gan_variant_research_tpu.models import ResNetGenerator

    gen = ResNetGenerator(ngf=8, n_blocks=2, use_attention=True,
                          attn_layers=(1,))
    params = gen.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    with pytest.raises(ValueError, match="attn_1"):
        generator_params_to_state_dict(params)
