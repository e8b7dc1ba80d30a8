"""Data pipeline: host-side JPEG decode + device-resident augmentation.

The reference's dataio (PIL + torchvision transforms + DataLoader worker
processes, GAN_Variant1/dataio/, Basic_GAN/src/data.py) becomes: a threaded
host loader that only decodes images to uint8 batches, and a fused
device-side augmentation stage (random crop-resize / flip / color jitter)
that runs inside the jitted train step — per the BASELINE.json north star.
"""

from gan_variant_research_tpu.data.folders import enumerate_images, list_images
from gan_variant_research_tpu.data.loader import ImageFolderSource, UnpairedLoader
from gan_variant_research_tpu.data.augment import train_augment, eval_transform

__all__ = [
    "enumerate_images",
    "list_images",
    "ImageFolderSource",
    "UnpairedLoader",
    "train_augment",
    "eval_transform",
]
