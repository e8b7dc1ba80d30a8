"""Training layer: donated jitted train steps (CUT + CycleGAN), EMA, optax
chains, checkpointing, loss tracking and the training loop driver."""
