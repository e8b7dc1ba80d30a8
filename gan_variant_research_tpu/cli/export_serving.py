"""Export a trained generator as a self-contained AOT serving artifact.

The reference's only deployment form is a torch checkpoint that needs the
full model code (and its `inspect.signature` reconstruction heuristics,
generate_folder.py:88-116) to serve. This CLI goes one step further down
the TPU-native path: `jax.export` lowers the jitted serving function —
uint8 NHWC in, stylized uint8 NHWC out, EMA parameters baked in as
constants — to serialized StableHLO, the XLA ecosystem's stable portable
IR. The artifact:

- is **self-contained**: no framework, model code, or checkpoint needed to
  serve it — only `jax.export.deserialize` (any JAX ≥ the export's
  calling-convention version);
- is **batch-polymorphic**: exported with a symbolic leading dimension, so
  one artifact serves any batch size;
- carries lowerings for **both TPU and CPU** by default, so the same file
  deploys to a TPU VM or a CPU fallback host;
- bakes the exact serving preprocessing/postprocessing contract
  (bilinear resize → [−1,1] → generator → clamp/round → uint8) used by
  `generate_folder` (reference generate_folder.py:237-246), so artifact
  outputs are byte-identical to the CLI's.

Usage:

    python -m gan_variant_research_tpu.cli.export_serving \
        --ckpt ckpt_final.msgpack --out monet.gvrserve \
        [--size 256] [--no-ema] [--direction A2B] [--platforms tpu,cpu]

Serving:

    from gan_variant_research_tpu.cli.export_serving import load_artifact
    serve = load_artifact("monet.gvrserve")
    out_u8 = serve(photos_u8)            # any batch size
"""

from __future__ import annotations

import argparse
from pathlib import Path


def make_serve_fn(generator, params, size: int):
    """The serving program: uint8 NHWC (any resolution) → stylized uint8
    NHWC at ``size``². Identical math to generate_folder's forward."""
    import jax.numpy as jnp

    from gan_variant_research_tpu.ops.color import to_uint8
    from gan_variant_research_tpu.ops.resize import resize_bilinear

    def serve(u8):
        x01 = u8.astype(jnp.float32) / 255.0
        x = jnp.clip(resize_bilinear(x01, (size, size)), 0.0, 1.0) * 2.0 - 1.0
        y = generator.apply({"params": params}, x)
        return to_uint8(y)

    return serve


def export_serving(
    ckpt: str | Path,
    out: str | Path,
    size: int = 256,
    use_ema: bool = True,
    direction: str = "A2B",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    in_size: int | None = None,
) -> Path:
    """Export the checkpoint's generator to a serialized StableHLO artifact
    at ``out``. ``in_size`` fixes the input resolution (defaults to
    ``size`` — inputs are resized to ``size``² on device either way)."""
    import jax
    from jax import export as jexport

    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
    )

    generator, params, _ = load_generator_params(
        str(ckpt), use_ema=use_ema, direction=direction)
    if getattr(generator, "use_attention", False):
        # the portable artifact must lower for every requested platform
        # with a symbolic batch dim — the Pallas flash kernel has neither a
        # CPU lowering nor a polymorphic grid, so exports always take the
        # exact einsum attention core (models/attention.py)
        generator = generator.clone(attn_flash=False, attn_mesh=None)
    serve = make_serve_fn(generator, params, size)

    in_size = size if in_size is None else in_size
    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, in_size, in_size, 3), jax.numpy.uint8)
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(spec)
    blob = exported.serialize()
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    print(f"Exported {out} ({len(blob) / 1e6:.1f} MB, platforms="
          f"{','.join(platforms)}, input (b, {in_size}, {in_size}, 3) uint8)")
    return out


def load_artifact(path: str | Path):
    """Deserialize a serving artifact → a callable (uint8 NHWC → uint8
    NHWC). No framework or checkpoint needed beyond this function."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())

    def serve(u8):
        return exported.call(u8)

    return serve


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export a generator checkpoint to a self-contained "
                    "StableHLO serving artifact")
    p.add_argument("--ckpt", required=True, help="Checkpoint (.msgpack)")
    p.add_argument("--out", required=True, help="Output artifact path")
    p.add_argument("--size", type=int, default=256,
                   help="Serving resolution (output, and resize target)")
    p.add_argument("--in-size", type=int, default=None,
                   help="Fixed input resolution (default: --size)")
    p.add_argument("--no-ema", action="store_true",
                   help="Bake raw generator params instead of the EMA shadow")
    p.add_argument("--direction", choices=("A2B", "B2A"), default="A2B",
                   help="For CycleGAN checkpoints: which generator to export")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="Comma-separated lowering platforms (default tpu,cpu)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    export_serving(
        args.ckpt,
        args.out,
        size=args.size,
        use_ema=not args.no_ema,
        direction=args.direction,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        in_size=args.in_size,
    )


if __name__ == "__main__":
    main()
