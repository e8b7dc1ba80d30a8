"""CUT training CLI — flag surface of the reference entry point
(GAN_Variant1/training/train_cutpp.py:39-48):

    python -m gan_variant_research_tpu.cli.train_cutpp \
        --config .../train_gan_cutpp.yaml --resume <ckpt|auto> \
        --set loss_weights.patchnce=1.0 model.generator.ngf=64
"""

from __future__ import annotations

import argparse
from pathlib import Path

from gan_variant_research_tpu.core.config import (
    CUT_SCHEMA,
    load_config,
    override_config,
    validate_config,
)
from gan_variant_research_tpu.core.prng import step_keys  # noqa: F401 (re-export)
from gan_variant_research_tpu.train.loop import train_cut

DEFAULT_CONFIG = Path(__file__).parent.parent / "configs" / "train_gan_cutpp.yaml"


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train CUT (TPU-native)")
    parser.add_argument("--config", type=str, default=str(DEFAULT_CONFIG),
                        help="Path to config file")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint to resume from, or 'auto' for latest")
    parser.add_argument("--set", nargs="+", action="append", default=[],
                        dest="overrides",
                        help="Override config values; repeatable "
                             "(e.g. --set loss_weights.adv=0.5 model.generator.ngf=32)")
    parser.add_argument("--strict-config", action="store_true",
                        help="Error (not warn) on unknown config keys")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config = load_config(args.config)
    overrides = [kv for group in args.overrides for kv in group]
    config = override_config(config, overrides)
    validate_config(config, CUT_SCHEMA, strict=args.strict_config)
    # multi-host entry hook — MUST run before anything touches the XLA
    # backend (jax.distributed.initialize() refuses afterwards); no-op on a
    # single host (SURVEY.md §5 "Distributed")
    from gan_variant_research_tpu.parallel import init_distributed

    init_distributed((config.get("parallel") or {}).get("multihost", "auto"))
    import jax

    print(f"Using device(s): {jax.devices()}")
    train_cut(config, resume=args.resume)


if __name__ == "__main__":
    main()
