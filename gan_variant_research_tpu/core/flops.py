"""Analytic model-FLOPs accounting for the CUT train step → MFU.

MFU (model FLOP utilization) = useful model FLOPs executed per second ÷ the
chip's peak bf16 FLOP/s. "Model FLOPs" is the algorithm's conv arithmetic
(2 FLOPs per MAC), NOT what the compiler happened to execute — remat
recompute, padding copies, and elementwise traffic do not count. This is
the same convention as the public scaling literature, so the number is
comparable across hardware and rounds.

Scope: convolutions only. They are >99% of the step's arithmetic; the
excluded terms are documented and bounded:

- PatchNCE logit matmuls: 5 layers × B × 256² × C MACs ≈ 0.5 GFLOP/image —
  <0.1% of the ~650 GFLOP/image conv total (losses/patchnce.py).
- DiffAugment / train_augment / EMA / optimizer / norms / activations:
  elementwise — O(pixels), not O(pixels × channels² × k²).

Per-step pass accounting for the fused CUT step
(train/cut_trainer.py::_train_step), in forward-equivalents where one
backward-with-weight-grads ≈ 2 forwards and one input-only backward
(weight grads dead-code-eliminated because the params are constants of the
differentiated function) ≈ 1 forward:

  Generator (G_f = one forward at batch B):
    big_fwd: G(photos) + G(fake)                      2 fwd
    g_vjp through both (weight grads needed)          2 bwd = 4
    identity branch (warm phase only): fwd + full bwd 3
    → steady 6 G_f, warm 9 G_f
  Discriminator (D_f = one forward at batch B):
    D step: fwd on concat(real,fake)=2B + full bwd    2 + 4 = 6
    G head: fwd on fake + input-only bwd              1 + 1 = 2
    R1 (every `r1.every` steps, amortized): inner
    d_sum fwd + input-grad (2 units), outer
    value_and_grad doubles the differentiated work    2 + 4 = 6, ÷ every
    → steady/warm 8 + 6/r1_every D_f

References for the reference program this step fuses:
/root/reference/GAN_Variant1/training/train_cutpp.py:206-331 (5 G fwd,
3 D fwd, 2 bwd per step — SURVEY.md §3.1); the fused step is
gradient-equivalent with 2 G fwd.
"""

from __future__ import annotations

from typing import Any

# Peak dense bf16 FLOP/s per chip by TPU generation (public spec sheets).
# Keys are lowercase substrings matched against jax Device.device_kind.
# Order matters: first match wins ("v5p" must precede "v5").
_PEAK_BF16 = (
    ("v6e", 918e12),        # Trillium
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5e", 197e12),
    ("v5 lite", 197e12),    # device_kind spelling on some stacks
    ("v5litepod", 197e12),
    ("v5", 197e12),         # bare "TPU v5" tunnels are the lite part here
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_bf16_flops(device_kind: str) -> float | None:
    """Peak dense bf16 FLOP/s for a jax ``Device.device_kind`` string, or
    None when the generation is unrecognized (CPU, emulators)."""
    kind = device_kind.lower()
    if "tpu" not in kind and not kind.startswith("v"):
        return None
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def _conv_flops(out_h: int, out_w: int, c_in: int, c_out: int, k: int) -> float:
    """2·MACs of a dense conv producing an (out_h, out_w, c_out) map."""
    return 2.0 * out_h * out_w * c_out * c_in * k * k


def generator_fwd_flops(image_size: int, ngf: int = 64, n_blocks: int = 9,
                        in_ch: int = 3, out_ch: int = 3,
                        n_downsampling: int = 2) -> float:
    """Conv FLOPs of ONE ResNet generator forward per image
    (models/generator_resnet.py; mirrors reference
    generator_resnet_attn.py:105-152). The s2d stem is an exact
    reorganization of the same MACs (ops/s2d.py), so this count holds with
    or without ``use_s2d``."""
    s = image_size
    total = _conv_flops(s, s, in_ch, ngf, 7)                 # stem 7×7
    ch = ngf
    for _ in range(n_downsampling):                          # 3×3 stride-2
        s //= 2
        total += _conv_flops(s, s, ch, ch * 2, 3)
        ch *= 2
    total += n_blocks * 2 * _conv_flops(s, s, ch, ch, 3)     # res trunk
    for _ in range(n_downsampling):
        # ConvTranspose stride-2: every input pixel scatters through the
        # full k² kernel → MACs = in_hw · k² · c_in · c_out
        total += 2.0 * s * s * ch * (ch // 2) * 9
        s *= 2
        ch //= 2
    total += _conv_flops(s, s, ch, out_ch, 7)                # head 7×7
    return total


def discriminator_fwd_flops(image_size: int, ndf: int = 64, n_layers: int = 3,
                            num_scales: int = 1, in_ch: int = 3) -> float:
    """Conv FLOPs of ONE PatchGAN forward per image
    (models/discriminator_patchgan.py; reference
    discriminator_patchgan.py:27-51). Multiscale sums the AvgPool(3,2,1)
    pyramid copies."""
    total = 0.0
    s = image_size
    for _ in range(num_scales):
        # 4×4 pad-1: stride 2 → out s/2 ; stride 1 → out s-1
        t, ch, hw = 0.0, ndf, s // 2
        t += _conv_flops(hw, hw, in_ch, ndf, 4)              # conv_0 s2
        for n in range(1, n_layers):
            nf = min(2 ** n, 8) * ndf
            hw //= 2
            t += _conv_flops(hw, hw, ch, nf, 4)              # conv_n s2
            ch = nf
        nf = min(2 ** n_layers, 8) * ndf
        t += _conv_flops(hw - 1, hw - 1, ch, nf, 4)          # conv_N s1
        t += _conv_flops(hw - 2, hw - 2, nf, 1, 4)           # conv_out s1
        total += t
        s //= 2                                              # next scale
    return total


def cut_step_flops(cfg: dict[str, Any], phase: str) -> float:
    """Model FLOPs of one fused CUT train step at the configured batch,
    R1-amortized, for ``phase`` in {"warm", "steady"} (identity branch on /
    compiled out — train/cut_trainer.py:639-660). See the module docstring
    for the pass accounting."""
    if phase not in ("warm", "steady"):
        raise ValueError(f"phase must be 'warm' or 'steady', got {phase!r}")
    batch = int(cfg["batch_size"])
    size = int(cfg.get("image_size", 256))
    g_cfg = cfg.get("model", {}).get("generator", {})
    d_cfg = cfg.get("model", {}).get("discriminator", {})
    g_f = generator_fwd_flops(
        size, ngf=int(g_cfg.get("ngf", 64)),
        n_blocks=int(g_cfg.get("n_blocks", 9)),
    )
    d_f = discriminator_fwd_flops(
        size, ndf=int(d_cfg.get("ndf", 64)),
        n_layers=int(d_cfg.get("n_layers", 3)),
        num_scales=int(d_cfg.get("num_scales", 1)),
    )
    r1_every = int((cfg.get("r1") or {}).get("every", 16))
    r1_gamma = float((cfg.get("r1") or {}).get("gamma", 0.0))
    g_units = 6.0 if phase == "steady" else 9.0
    d_units = 8.0 + (6.0 / r1_every if r1_gamma > 0 else 0.0)
    return batch * (g_units * g_f + d_units * d_f)
