"""gan_variant_research_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
Cameronr11/GAN-Variant-Research stack.

Three capability pillars mirroring the reference repo:

1. ``models`` / ``losses`` / ``train`` — CUT-style unpaired photo→Monet
   translator (reference ``GAN_Variant1/``) and a CycleGAN baseline
   (reference ``Basic_GAN/``), trained by a single donated jitted step.
2. ``evalsuite`` — standalone MiFID/FID evaluator (reference ``EVAL/``) with
   on-device InceptionV3 features, Fréchet distance and memorization
   analysis.
3. ``data`` / ``ops`` / ``parallel`` — TPU-first infrastructure: device-resident
   augmentation, Pallas kernels for the hot ops, and a mesh/collective layer
   for data-parallel scale-out.

The public CLI surface (configs, ``--set`` dot-path overrides,
``generate_folder``, eval CLI) keeps the reference's shape.
"""

__version__ = "0.1.0"
