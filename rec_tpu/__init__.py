"""rec_tpu — a TPU-native (JAX/XLA/Pallas) relative entropy coding framework.

A from-scratch re-design of gergely-flamich/relative-entropy-coding (iREC):
lossless and lossy neural image compression by encoding VAE latents with
relative entropy coding under shared counter-based randomness.
"""

__version__ = "0.1.0"
