"""GAN losses: hinge/LSGAN/BCE adversarial, PatchNCE, L1 identity/cycle."""

from gan_variant_research_tpu.losses.adversarial import (
    discriminator_hinge_loss,
    generator_hinge_loss,
    gan_loss,
)
from gan_variant_research_tpu.losses.patchnce import patch_nce_loss
from gan_variant_research_tpu.losses.reconstruction import (
    l1_loss,
    identity_loss,
    cycle_loss,
)

__all__ = [
    "discriminator_hinge_loss",
    "generator_hinge_loss",
    "gan_loss",
    "patch_nce_loss",
    "l1_loss",
    "identity_loss",
    "cycle_loss",
]
