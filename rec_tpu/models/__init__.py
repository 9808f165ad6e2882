"""Models layer (ref rec/models/__init__.py)."""

from .mnist_vae import MNISTVAE, MNISTVampVAE, SNISDistribution
from .resnet_vae import BidirectionalResNetVAE, ResNetVAEConfig

__all__ = ["BidirectionalResNetVAE", "ResNetVAEConfig", "MNISTVAE",
           "MNISTVampVAE", "SNISDistribution"]
