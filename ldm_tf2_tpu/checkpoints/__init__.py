"""Checkpoint layer: Orbax persistence + PyTorch (CompVis) weight conversion."""

from ldm_tf2_tpu.checkpoints.convert_pytorch import (
    convert_autoencoder_kl,
    convert_autoencoder_vq,
    convert_transformer,
    convert_unet,
)

__all__ = [
    "convert_autoencoder_kl",
    "convert_autoencoder_vq",
    "convert_transformer",
    "convert_unet",
]
