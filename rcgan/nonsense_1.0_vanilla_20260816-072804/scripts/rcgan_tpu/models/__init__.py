from rcgan_tpu.models.dcgan import DCGANConfig
from rcgan_tpu.models.resnet_gan import ResnetGANConfig
from rcgan_tpu.models.pggan import PGGANConfig

__all__ = ["DCGANConfig", "ResnetGANConfig", "PGGANConfig"]
