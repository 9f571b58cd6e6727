"""Model zoo: HuBERT, TextEncoder/PosteriorEncoder, flow, NSF-HiFiGAN,
synthesizer, discriminators, RMVPE, CREPE, FCPE — flax.linen modules in
canonical (B, T, C) layout, jit/bf16/shard-ready."""
