"""GAN losses: hinge/LSGAN/BCE adversarial, PatchNCE, L1 identity/cycle,
feature matching, Lab palette prior."""

from gan_variant_research_tpu.losses.adversarial import (
    discriminator_hinge_loss,
    generator_hinge_loss,
    gan_loss,
)
from gan_variant_research_tpu.losses.feat_matching import feature_matching_loss
from gan_variant_research_tpu.losses.palette_prior import palette_prior_loss
from gan_variant_research_tpu.losses.patchnce import patch_nce_loss
from gan_variant_research_tpu.losses.repulsion_knn import (
    min_cosine_distances,
    repulsion_loss,
)
from gan_variant_research_tpu.losses.reconstruction import (
    l1_loss,
    identity_loss,
    cycle_loss,
)

__all__ = [
    "discriminator_hinge_loss",
    "generator_hinge_loss",
    "gan_loss",
    "feature_matching_loss",
    "palette_prior_loss",
    "patch_nce_loss",
    "min_cosine_distances",
    "repulsion_loss",
    "l1_loss",
    "identity_loss",
    "cycle_loss",
]
