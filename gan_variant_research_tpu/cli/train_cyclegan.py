"""CycleGAN baseline CLI (Basic_GAN/src/train.py:139-144 flag surface):

    python -m gan_variant_research_tpu.cli.train_cyclegan \
        --config .../baseline.yaml [--set k.v=x ...]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from gan_variant_research_tpu.core.config import (
    CYCLEGAN_SCHEMA,
    load_config,
    override_config,
    validate_config,
)
from gan_variant_research_tpu.train.cyclegan_loop import train_cyclegan

DEFAULT_CONFIG = Path(__file__).parent.parent / "configs" / "baseline.yaml"


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train CycleGAN baseline (TPU-native)")
    parser.add_argument("--config", type=str, default=str(DEFAULT_CONFIG))
    parser.add_argument("--set", nargs="+", action="append", default=[],
                        dest="overrides")
    parser.add_argument("--strict-config", action="store_true")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path, or 'auto' for the newest "
                             "ckpt_e*.msgpack in training.save_dir "
                             "(beyond-reference: Basic_GAN cannot resume)")
    args = parser.parse_args(argv)
    config = load_config(args.config)
    config = override_config(config, [kv for g in args.overrides for kv in g])
    validate_config(config, CYCLEGAN_SCHEMA, strict=args.strict_config)
    # multi-host entry hook — must precede any XLA-backend-touching call
    from gan_variant_research_tpu.parallel import init_distributed

    init_distributed((config.get("parallel") or {}).get("multihost", "auto"))
    train_cyclegan(config, resume=args.resume)


if __name__ == "__main__":
    main()
