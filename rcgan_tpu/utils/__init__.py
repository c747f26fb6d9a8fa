from rcgan_tpu.utils.images import image_manifold_size, merge, save_cifar_samples, save_images
from rcgan_tpu.utils.metrics import MetricLogger
from rcgan_tpu.utils.profiling import StepTimer, annotate, trace
from rcgan_tpu.utils.run_dir import record_setting

__all__ = [
    "image_manifold_size",
    "merge",
    "save_cifar_samples",
    "save_images",
    "MetricLogger",
    "StepTimer",
    "annotate",
    "trace",
    "record_setting",
]
