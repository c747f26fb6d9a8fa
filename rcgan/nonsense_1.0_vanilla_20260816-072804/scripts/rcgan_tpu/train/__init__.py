from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig
from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig
from rcgan_tpu.train.state import TrainState

__all__ = ["CifarTrainer", "CifarTrainConfig", "MnistTrainer", "MnistTrainConfig", "TrainState"]
