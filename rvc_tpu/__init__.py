"""rvc_tpu — TPU-native Retrieval-based Voice Conversion framework.

A from-scratch JAX/XLA/Pallas implementation of the full RVC capability
surface (reference: Acelogic/Retrieval-based-Voice-Conversion-MLX):
HuBERT content encoding, RMVPE/CREPE/FCPE/DSP pitch extraction, IVFFlat
retrieval blending, the VITS-style TextEncoder/flow synthesizer and
NSF-HiFiGAN vocoder, offline + realtime (SOLA) pipelines, GAN training,
preprocessing and index building — designed TPU-first: one canonical
(B, T, C) layout, static bucketed shapes, jit-compiled end to end, and
`jax.sharding.Mesh`-based scaling for multi-chip/multi-host runs.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep `import rvc_tpu` light)
    if name == "RVC":
        from rvc_tpu.api import RVC

        return RVC
    if name == "get_config":
        from rvc_tpu.configs import get_config

        return get_config
    raise AttributeError(name)
