from rcgan_tpu.evals.classifier import (
    EvalClassifier,
    cifar_classifier,
    generated_label_accuracy,
    mnist_classifier,
)
from rcgan_tpu.evals.inception import inception_score, preds_to_score
from rcgan_tpu.evals.msssim import msssim, ssim
from rcgan_tpu.evals.recover import RecoverConfig, recover_labels

__all__ = [
    "EvalClassifier",
    "cifar_classifier",
    "generated_label_accuracy",
    "mnist_classifier",
    "inception_score",
    "preds_to_score",
    "msssim",
    "ssim",
    "RecoverConfig",
    "recover_labels",
]
