from .unet import DenoisingUnet

__all__ = ['DenoisingUnet']
