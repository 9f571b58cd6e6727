"""Training subsystem: losses, data pipeline, jitted GAN train step,
schedulers, overtraining detection, checkpointing."""
