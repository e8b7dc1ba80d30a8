"""Model zoo: ResNet-9 generator (CUT + CycleGAN lineages), U-Net generator
(notebook lineage), PatchGAN / multiscale discriminators."""

from gan_variant_research_tpu.models.generator_resnet import (
    ResNetGenerator,
    ResidualBlock,
)
from gan_variant_research_tpu.models.generator_unet import UNetGenerator
from gan_variant_research_tpu.models.attention import (
    SelfAttention2d,
    ChannelAttention,
    StyleGate,
)
from gan_variant_research_tpu.models.discriminator_patchgan import (
    PatchGANDiscriminator,
    MultiscaleDiscriminator,
)

__all__ = [
    "ResNetGenerator",
    "ResidualBlock",
    "UNetGenerator",
    "PatchGANDiscriminator",
    "MultiscaleDiscriminator",
    "SelfAttention2d",
    "ChannelAttention",
    "StyleGate",
]
