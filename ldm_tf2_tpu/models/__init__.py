"""Neural-net modules (pure functions of params + inputs; no training logic).

Flax/linen re-designs of the reference's L1 layer (SURVEY.md §2.1):
U-Net epsilon-predictor, KL/VQ autoencoders, BERT-style text transformer,
vector quantizer, diagonal-Gaussian posterior, LPIPS, PatchGAN discriminator.
"""

from ldm_tf2_tpu.models.autoencoder import AutoencoderKL, AutoencoderVQ
from ldm_tf2_tpu.models.discriminator import Discriminator
from ldm_tf2_tpu.models.distribution import DiagonalGaussian
from ldm_tf2_tpu.models.lpips import LPIPS
from ldm_tf2_tpu.models.quantize import VectorQuantizer
from ldm_tf2_tpu.models.transformer import TransformerModel
from ldm_tf2_tpu.models.unet import UNet

__all__ = [
    "AutoencoderKL",
    "AutoencoderVQ",
    "DiagonalGaussian",
    "Discriminator",
    "LPIPS",
    "TransformerModel",
    "UNet",
    "VectorQuantizer",
]
