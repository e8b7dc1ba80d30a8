"""Inspect a checkpoint: step, family, payload trees, param counts, config.

The reference's checkpoints are opaque pickles that users probe with ad-hoc
`torch.load` snippets (its own inference CLI carries a four-stage guessing
chain just to find the generator weights, generate_folder.py:127-167).
Here the schema is documented and this tool prints it:

    python -m gan_variant_research_tpu.cli.ckpt_info --ckpt ckpt_final.msgpack
    python -m gan_variant_research_tpu.cli.ckpt_info --ckpt ... --json

Output covers: the step counter, the detected trainer family (CUT /
CycleGAN), per-tree leaf/parameter counts, EMA presence, whether the PRNG
base key is checkpointed (bitwise-resume capable), and the embedded config
(model block + precision) — enough to answer "what is this file and can I
serve/resume it" without loading any model code.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _tree_stats(tree) -> dict:
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "shape")]
    return {
        "leaves": len(leaves),
        "parameters": int(sum(np.prod(x.shape) for x in leaves)),
    }


def describe_checkpoint(ckpt_path: str | Path) -> dict:
    """Structured description of a checkpoint file (pure host-side: no
    device work, no model construction)."""
    from gan_variant_research_tpu.train.checkpoint import load_checkpoint

    blob = load_checkpoint(ckpt_path)
    payload = blob["payload"]
    config = blob["config"] or {}

    if "G_A2B" in payload:
        family = "cyclegan"
        trees = {k: payload[k] for k in
                 ("G_A2B", "G_B2A", "D_A", "D_B") if k in payload}
    else:
        family = "cut"
        trees = {k: payload[k] for k in
                 ("generator", "discriminator") if k in payload}
        ema = payload.get("ema_G") or {}
        if isinstance(ema.get("shadow"), dict):
            trees["ema_G.shadow"] = ema["shadow"]

    info = {
        "path": str(ckpt_path),
        "file_mb": round(Path(ckpt_path).stat().st_size / 1e6, 2),
        "step": blob["step"],
        "family": family,
        "payload_keys": sorted(payload),
        "trees": {k: _tree_stats(v) for k, v in trees.items()},
        "has_ema": family == "cut" and "ema_G.shadow" in trees,
        "has_prng_key": "base_key" in payload,  # bitwise resume capable
        "optimizer_state": any(k.lower().startswith(("opt", "optim"))
                               for k in payload),
        "model_config": config.get("model") or {},
        "precision": (config.get("runtime") or {}).get("precision"),
        "image_size": config.get("image_size"),
        "metrics": blob.get("metrics") or {},
    }
    return info


def main(argv=None):
    p = argparse.ArgumentParser(description="Inspect a .msgpack checkpoint")
    p.add_argument("--ckpt", required=True, help="Checkpoint (.msgpack)")
    p.add_argument("--json", action="store_true",
                   help="Machine-readable JSON instead of the summary")
    args = p.parse_args(argv)
    info = describe_checkpoint(args.ckpt)
    if args.json:
        print(json.dumps(info, indent=2))
        return
    print(f"{info['path']} ({info['file_mb']} MB)")
    print(f"  family:     {info['family']}   step: {info['step']}")
    for name, st in info["trees"].items():
        print(f"  {name}: {st['parameters']:,} params ({st['leaves']} leaves)")
    print(f"  EMA shadow: {info['has_ema']}   PRNG key (bitwise resume): "
          f"{info['has_prng_key']}   optimizer state: "
          f"{info['optimizer_state']}")
    if info["model_config"]:
        print(f"  model:      {json.dumps(info['model_config'])}")
    if info["image_size"]:
        print(f"  image_size: {info['image_size']}   precision: "
              f"{info['precision']}")


if __name__ == "__main__":
    main()
