"""Analytic FLOPs/MFU accounting (core/flops.py).

The generator/discriminator counts are pinned against an INDEPENDENT
layer-by-layer table computed here by hand from the module topology
(models/generator_resnet.py, models/discriminator_patchgan.py — the same
shapes as reference generator_resnet_attn.py:105-152 /
discriminator_patchgan.py:27-51), so a drift in either the model or the
accounting breaks the test.
"""

import pytest

from gan_variant_research_tpu.core.flops import (
    cut_step_flops,
    discriminator_fwd_flops,
    generator_fwd_flops,
    peak_bf16_flops,
)


def test_generator_fwd_flops_tiny_hand_table():
    # size 64, ngf 8, n_blocks 2: stem 7×7 3→8 @64²; down 3×3 8→16 @32²,
    # 16→32 @16²; 2 blocks × 2 convs 32→32 @16²; up (transpose, MACs =
    # in_hw·9·cin·cout) 32→16 @16²-in, 16→8 @32²-in; head 7×7 8→3 @64².
    expect = 2 * (
        64 * 64 * 8 * 3 * 49
        + 32 * 32 * 16 * 8 * 9
        + 16 * 16 * 32 * 16 * 9
        + 2 * 2 * (16 * 16 * 32 * 32 * 9)
        + 16 * 16 * 32 * 16 * 9
        + 32 * 32 * 16 * 8 * 9
        + 64 * 64 * 3 * 8 * 49
    )
    assert generator_fwd_flops(64, ngf=8, n_blocks=2) == expect


def test_discriminator_fwd_flops_tiny_hand_table():
    # size 64, ndf 8, n_layers 3: conv0 4×4 s2 3→8 @32²; conv1 s2 8→16
    # @16²; conv2 s2 16→32 @8²; conv3 s1 32→64 @7² (k4 pad1); out s1
    # 64→1 @6².
    expect = 2 * (
        32 * 32 * 8 * 3 * 16
        + 16 * 16 * 16 * 8 * 16
        + 8 * 8 * 32 * 16 * 16
        + 7 * 7 * 64 * 32 * 16
        + 6 * 6 * 1 * 64 * 16
    )
    assert discriminator_fwd_flops(64, ndf=8, n_layers=3) == expect


def test_multiscale_sums_pyramid():
    one = discriminator_fwd_flops(64, ndf=8)
    two = discriminator_fwd_flops(64, ndf=8, num_scales=2)
    assert two == one + discriminator_fwd_flops(32, ndf=8)


def test_cut_step_flops_phases_and_r1():
    cfg = {
        "batch_size": 4,
        "image_size": 64,
        "model": {
            "generator": {"ngf": 8, "n_blocks": 2},
            "discriminator": {"ndf": 8, "n_layers": 3, "num_scales": 1},
        },
        "r1": {"every": 16, "gamma": 10.0},
    }
    g = generator_fwd_flops(64, ngf=8, n_blocks=2)
    d = discriminator_fwd_flops(64, ndf=8)
    steady = cut_step_flops(cfg, "steady")
    warm = cut_step_flops(cfg, "warm")
    assert steady == 4 * (6 * g + (8 + 6 / 16) * d)
    # warm adds exactly the identity branch: fwd + full bwd = 3 G forwards
    assert warm - steady == 4 * 3 * g
    # R1 off (gamma 0) drops exactly the amortized double-backward term
    cfg["r1"]["gamma"] = 0.0
    assert cut_step_flops(cfg, "steady") == 4 * (6 * g + 8 * d)
    with pytest.raises(ValueError):
        cut_step_flops(cfg, "cold")


def test_flagship_magnitude():
    # The flagship step (batch 32 × 256²) is ~20.7 TFLOP steady — the
    # number BENCH_r05's MFU divides by. Pin the magnitude loosely so a
    # unit slip (MAC vs FLOP, batch double-count) can't pass silently.
    cfg = {
        "batch_size": 32,
        "image_size": 256,
        "model": {
            "generator": {"ngf": 64, "n_blocks": 9},
            "discriminator": {"ndf": 64, "n_layers": 3, "num_scales": 1},
        },
        "r1": {"every": 16, "gamma": 10.0},
    }
    assert 19e12 < cut_step_flops(cfg, "steady") < 22e12
    assert 28e12 < cut_step_flops(cfg, "warm") < 32e12


def test_peak_lookup():
    assert peak_bf16_flops("TPU v5e") == 197e12
    assert peak_bf16_flops("TPU v5 lite") == 197e12
    assert peak_bf16_flops("TPU v5p") == 459e12
    assert peak_bf16_flops("TPU v4") == 275e12
    assert peak_bf16_flops("TPU v6e") == 918e12
    assert peak_bf16_flops("cpu") is None
    assert peak_bf16_flops("Interpreter") is None
