"""Export one of our ``.msgpack`` checkpoints to the reference's torch
``.pt`` layout — the inverse bridge to ``import_torch_checkpoint``.

A checkpoint trained in this framework becomes loadable by the reference's
own tooling (``generate_folder.py:127-167`` ``_pick_state_dict`` accepts the
``generator``/``ema_state_dict`` keys written here; the tensors are an exact
``ResNetGenerator.state_dict()`` key space per
``GAN_Variant1/models/generator_resnet_attn.py:74-162``), so reference users
can stylize/score our weights with their torch + torchmetrics pipeline:

    python -m gan_variant_research_tpu.cli.export_torch_checkpoint \
        --ckpt ckpt_final.msgpack --out ckpt_final.pt [--padding reflect]

Layout inverses of the importer (import_torch_checkpoint.py:37-105):
HWIO→OIHW for plain convs; our flipped-HWIO ConvTranspose correlation
kernel → torch's (in, out, kh, kw) scatter kernel (unflip + transpose).
Space-to-depth stem/head reparametrization is checkpoint-invariant
(ops/s2d.py), so no special-casing is needed here.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _hwio_to_oihw(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).transpose(3, 2, 0, 1))


def _hwio_to_convtranspose(w) -> np.ndarray:
    """Our flipped HWIO correlation kernel → torch (in, out, kh, kw)."""
    w = np.asarray(w, dtype=np.float32)[::-1, ::-1, :, :]  # unflip spatial
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def generator_params_to_state_dict(params: dict,
                                   padding_type: str = "reflect") -> dict:
    """Our flax ``ResNetGenerator`` param tree → the reference
    ``ResNetGenerator.state_dict()`` key space (numpy tensors; callers
    torch-ify). Exact inverse of ``convert_generator_state_dict``."""
    # Sequential indices mirror the importer: the stem/head pad module exists
    # only for reflect; ResidualBlock pads for reflect AND replicate
    # (generator_resnet_attn.py:24-28,110-113,157-160)
    stem_i = 1 if padding_type == "reflect" else 0
    c1, c2 = (1, 5) if padding_type in ("reflect", "replicate") else (0, 3)

    sd: dict = {}

    def put_conv(flax_module: str, torch_prefix: str, transpose=False):
        node = params[flax_module]
        conv = _hwio_to_convtranspose(node["kernel"]) if transpose \
            else _hwio_to_oihw(node["kernel"])
        sd[f"{torch_prefix}.weight"] = conv
        if "bias" in node:
            sd[f"{torch_prefix}.bias"] = np.asarray(node["bias"], np.float32)

    put_conv("initial_conv", f"initial.{stem_i}")

    n_down = sum(1 for k in params if k.startswith("down_"))
    n_blocks = sum(1 for k in params if k.startswith("res_"))
    if n_down == 0 or n_blocks == 0:
        raise ValueError(
            "Param tree does not look like our ResNetGenerator "
            f"(found {n_down} down convs, {n_blocks} res blocks); "
            f"modules: {sorted(params)[:5]}"
        )
    for i in range(n_down):
        put_conv(f"down_{i}", f"downsample.{3 * i}")

    for i in range(n_blocks):
        node = params[f"res_{i}"]
        pre = f"res_blocks.{i}.conv_block"
        sd[f"{pre}.{c1}.weight"] = _hwio_to_oihw(node["conv1_kernel"])
        sd[f"{pre}.{c2}.weight"] = _hwio_to_oihw(node["conv2_kernel"])
        if "conv1_bias" in node:
            sd[f"{pre}.{c1}.bias"] = np.asarray(node["conv1_bias"], np.float32)
            sd[f"{pre}.{c2}.bias"] = np.asarray(node["conv2_bias"], np.float32)

    for i in range(n_down):
        put_conv(f"up_{i}", f"upsample.{3 * i}", transpose=True)

    put_conv("output_conv", f"output.{stem_i}")

    # Fail loudly on anything the reference's baseline state_dict cannot
    # represent (trained attention/style-gate variants, models/attention.py):
    # silently dropping those params would export a generator that produces
    # different images with no warning.
    consumed = ({"initial_conv", "output_conv"}
                | {f"down_{i}" for i in range(n_down)}
                | {f"res_{i}" for i in range(n_blocks)}
                | {f"up_{i}" for i in range(n_down)})
    extra = sorted(set(params) - consumed)
    if extra:
        raise ValueError(
            "Param tree has modules the reference's baseline "
            f"ResNetGenerator.state_dict() cannot represent: {extra}. "
            "Variant checkpoints (use_attention / use_channel_attn / "
            "use_style_dropout) are not exportable to the torch layout."
        )
    return sd


def export_torch_checkpoint(ckpt_path: str | Path, out_path: str | Path,
                            padding_type: str = "reflect") -> Path:
    """Our ``.msgpack`` checkpoint → reference-layout ``.pt``. Writes the
    raw generator under ``generator`` and (when present) the EMA shadow
    under ``ema_G.shadow`` — the exact keys the reference's training loop
    saves (io_ckpt.py:56-87) and its inference CLI restores EMA-first
    (generate_folder.py:130-141)."""
    import torch

    from gan_variant_research_tpu.train.checkpoint import load_checkpoint

    blob = load_checkpoint(ckpt_path)
    payload = blob["payload"]
    if "generator" not in payload:
        raise KeyError(
            f"{ckpt_path} has no 'generator' payload (keys: {sorted(payload)}) "
            "— CycleGAN joint checkpoints are not reference-CUT exportable"
        )

    def torchify(np_sd: dict) -> dict:
        # copy: msgpack-restored arrays can be non-writable views
        return {k: torch.from_numpy(np.array(v, dtype=np.float32))
                for k, v in np_sd.items()}

    out: dict = {
        "step": int(blob.get("step", 0)),
        "generator": torchify(generator_params_to_state_dict(
            payload["generator"], padding_type)),
        "config": blob.get("config") or {},
        "metrics": blob.get("metrics") or {},
    }
    ema = payload.get("ema_G") or {}
    if isinstance(ema.get("shadow"), dict):
        out["ema_G"] = {
            "decay": float(ema.get("decay", 0.999)),
            "shadow": torchify(generator_params_to_state_dict(
                ema["shadow"], padding_type)),
        }

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(out, out_path)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert one of our .msgpack checkpoints to a "
                    "reference-layout torch .pt")
    p.add_argument("--ckpt", required=True, help="Our .msgpack checkpoint")
    p.add_argument("--out", required=True, help="Output .pt path")
    p.add_argument("--padding", default="reflect",
                   choices=["reflect", "replicate", "zero"])
    args = p.parse_args(argv)
    out = export_torch_checkpoint(args.ckpt, args.out, args.padding)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
