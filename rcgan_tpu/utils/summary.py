"""TensorBoard summary channel (reference observability channel (c):
``tf.summary`` scalar/histogram/image writers, ``mnist/model.py:226-272``,
``cifar10/gan_resnet.py:698,787,905-907``), via the tensorboard package with
graceful no-op degradation when it is absent."""

from __future__ import annotations

import logging


import numpy as np

log = logging.getLogger(__name__)


class SummaryWriter:
    def __init__(self, log_dir: str):
        self._w = None
        try:
            from flax.metrics.tensorboard import SummaryWriter as _SW

            self._w = _SW(log_dir)
        except Exception as e:  # no tensorboard — metrics still go to MetricLogger
            log.warning("tensorboard writer unavailable (%s); summaries disabled", e)

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.scalar(tag, float(value), step)

    def histogram(self, tag: str, values, step: int, bins: int = 30):
        if self._w is not None:
            self._w.histogram(tag, np.asarray(values), step, bins=bins)

    def image(self, tag: str, image, step: int):
        if self._w is not None:
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
            self._w.image(tag, arr, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
