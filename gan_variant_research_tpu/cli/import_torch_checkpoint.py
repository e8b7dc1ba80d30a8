"""Import a reference torch ``.pt`` checkpoint into this framework.

The reference saves ``{step, generator, discriminator, opt_G, opt_D,
ema_G{decay, shadow}, scaler, metrics, config}`` via ``torch.save``
(GAN_Variant1/utils/io_ckpt.py:56-87); its inference CLI accepts many legacy
layouts (generate_folder.py:127-167). This converter maps the generator
weights (raw + EMA shadow) into our flax parameter tree and writes a
``.msgpack`` checkpoint that ``cli.generate_folder`` loads directly — so a
real reference checkpoint can be stylized by both stacks and image-diffed
(VERDICT round-1, missing #4).

    python -m gan_variant_research_tpu.cli.import_torch_checkpoint \
        --ckpt ckpt_final.pt --out ckpt_final.msgpack [--padding reflect]

Name mapping (reflect baseline; torch Sequentials number norm/act layers):

    initial.1.weight                  → initial_conv/kernel   (OIHW→HWIO)
    downsample.{3i}.weight            → down_{i}/kernel
    res_blocks.{i}.conv_block.1|5.*   → res_{i}/conv1_*|conv2_*
    upsample.{3i}.weight              → up_{i}/kernel         (IOHW→HWIO + spatial flip)
    output.1.weight                   → output_conv/kernel

torch ConvTranspose2d stores the scatter kernel (in, out, kh, kw); our
``ConvTranspose2d`` correlates an lhs-dilated input with an HWIO kernel, so
the conversion transposes to (kh, kw, in, out) and flips both spatial axes
(models/layers.py:101-113).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _oihw_to_hwio(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).transpose(2, 3, 1, 0))


def _convtranspose_to_hwio(w) -> np.ndarray:
    """torch (in, out, kh, kw) scatter kernel → our flipped HWIO correlation
    kernel."""
    w = np.asarray(w, dtype=np.float32).transpose(2, 3, 0, 1)  # → (kh, kw, in, out)
    return np.ascontiguousarray(w[::-1, ::-1, :, :])


def convert_generator_state_dict(sd: dict, padding_type: str = "reflect") -> dict:
    """Reference ``ResNetGenerator.state_dict()`` (or EMA shadow dict — same
    key space, io_ckpt.py:19-21) → flax params for our ``ResNetGenerator``.

    Architecture hyperparameters (ngf, n_blocks, n_downsampling, use_bias)
    are inferred from the tensor shapes/keys.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # The reference inserts the stem/head pad module only for 'reflect'
    # (generator_resnet_attn.py:110-113,157-160: replicate uses the conv's
    # own padding=3), so the 7×7 convs sit at initial.0/output.0 for both
    # replicate and zero. ResidualBlock DOES add a pad module for replicate
    # (:24-28), so the res-block convs stay at indices 1/5 there.
    stem_i = 1 if padding_type == "reflect" else 0
    c1, c2 = (1, 5) if padding_type in ("reflect", "replicate") else (0, 3)

    params: dict = {}

    def put_conv(torch_prefix: str, flax_module: str, transpose=False,
                 kernel_leaf="kernel", bias_leaf="bias"):
        w = sd[f"{torch_prefix}.weight"]
        conv = _convtranspose_to_hwio(w) if transpose else _oihw_to_hwio(w)
        node = params.setdefault(flax_module, {})
        node[kernel_leaf] = conv
        b = sd.get(f"{torch_prefix}.bias")
        if b is not None:
            node[bias_leaf] = np.asarray(b, dtype=np.float32)

    put_conv(f"initial.{stem_i}", "initial_conv")

    n_down = 0
    while f"downsample.{3 * n_down}.weight" in sd:
        put_conv(f"downsample.{3 * n_down}", f"down_{n_down}")
        n_down += 1

    n_blocks = 0
    while f"res_blocks.{n_blocks}.conv_block.{c1}.weight" in sd:
        pre = f"res_blocks.{n_blocks}.conv_block"
        node = params.setdefault(f"res_{n_blocks}", {})
        node["conv1_kernel"] = _oihw_to_hwio(sd[f"{pre}.{c1}.weight"])
        node["conv2_kernel"] = _oihw_to_hwio(sd[f"{pre}.{c2}.weight"])
        if f"{pre}.{c1}.bias" in sd:
            node["conv1_bias"] = np.asarray(sd[f"{pre}.{c1}.bias"], np.float32)
            node["conv2_bias"] = np.asarray(sd[f"{pre}.{c2}.bias"], np.float32)
        n_blocks += 1

    for i in range(n_down):
        put_conv(f"upsample.{3 * i}", f"up_{i}", transpose=True)

    put_conv(f"output.{stem_i}", "output_conv")

    if n_down == 0 or n_blocks == 0:
        raise ValueError(
            "State dict does not look like the reference ResNetGenerator "
            f"(found {n_down} downsample convs, {n_blocks} res blocks); "
            f"keys start with: {sorted(sd)[:5]}"
        )
    return params


def generator_config_from_params(params: dict, padding_type: str = "reflect") -> dict:
    """Infer the model.generator config block from a converted param tree."""
    ngf = int(params["initial_conv"]["kernel"].shape[-1])
    n_blocks = sum(1 for k in params if k.startswith("res_"))
    n_down = sum(1 for k in params if k.startswith("down_"))
    use_bias = "bias" in params["initial_conv"]
    return {
        "ngf": ngf,
        "n_blocks": n_blocks,
        "n_downsampling": n_down,
        "padding_type": padding_type,
        "use_bias": use_bias,
    }


def import_torch_checkpoint(ckpt_path: str | Path, out_path: str | Path,
                            padding_type: str = "reflect") -> Path:
    """Convert a reference ``.pt`` training checkpoint (or a bare generator
    state dict) to our msgpack checkpoint with EMA-first layout."""
    import torch

    from gan_variant_research_tpu.train.checkpoint import save_checkpoint

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not isinstance(blob, dict):
        raise ValueError(f"Unsupported checkpoint object: {type(blob)}")

    # layered key fallbacks, mirroring the reference's _pick_state_dict
    # (generate_folder.py:120-167): generator → its EXPECT_KEYS legacy names
    # → raw all-tensor state dict → shallow nested all-tensor dict
    def _is_state_dict(d):
        return (isinstance(d, dict) and d
                and all(torch.is_tensor(v) for v in d.values()))

    gen_sd = None
    for key in ("generator", "G", "netG", "model",
                "ema_state_dict", "G_ema", "G_state_dict", "state_dict"):
        # require an actual tensor state dict so a config/metadata dict under
        # an earlier key (e.g. "model": {...hyperparams...}) cannot shadow the
        # real weights under a later one
        if _is_state_dict(blob.get(key)):
            gen_sd = blob[key]
            break
    if gen_sd is None and _is_state_dict(blob):
        gen_sd = blob  # bare state dict
    if gen_sd is None:
        for v in blob.values():  # last resort: shallow nested scan
            if _is_state_dict(v):
                gen_sd = v
                break
    if gen_sd is None:
        raise KeyError(
            f"No generator state dict found in {ckpt_path}; keys: {sorted(blob)[:10]}"
        )

    gen_params = convert_generator_state_dict(gen_sd, padding_type)
    payload: dict = {"generator": gen_params}

    ema = blob.get("ema_G")
    if isinstance(ema, dict) and isinstance(ema.get("shadow"), dict):
        payload["ema_G"] = {
            "decay": float(ema.get("decay", 0.999)),
            "shadow": convert_generator_state_dict(ema["shadow"], padding_type),
        }

    step = int(blob.get("step", 0))
    config = {"model": {"generator":
                        generator_config_from_params(gen_params, padding_type)}}
    ref_cfg = blob.get("config")
    if isinstance(ref_cfg, dict):
        config["reference_config"] = _jsonable(ref_cfg)
    return save_checkpoint(out_path, step, payload, config=config,
                           metrics=_jsonable(blob.get("metrics") or {}))


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a reference torch .pt checkpoint to .msgpack")
    p.add_argument("--ckpt", required=True, help="Reference .pt checkpoint")
    p.add_argument("--out", required=True, help="Output .msgpack path")
    p.add_argument("--padding", default="reflect",
                   choices=["reflect", "replicate", "zero"])
    args = p.parse_args(argv)
    out = import_torch_checkpoint(args.ckpt, args.out, args.padding)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
