from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
from rcgan_tpu.algorithms.mnist import MnistAlgoConfig

__all__ = ["CifarAlgoConfig", "MnistAlgoConfig"]
