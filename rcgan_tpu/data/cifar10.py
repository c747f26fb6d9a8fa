"""CIFAR-10 loader + noisy-label pipeline
(reference: ``cifar10/common/data/cifar10.py:10-52``).

Yields the reference 5-tuple ``(images_uint8[B,3072] CHW-flat, labels,
labels_random, labels_biased, labels_inv_weights)``; dequantization +
CHW→HWC happen on-device inside the train step
(``cifar10/gan_resnet.py:548-551``).  Corruption is vectorized.

Synthetic fallback mirrors :mod:`rcgan_tpu.data.mnist`.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Iterator, Tuple

import numpy as np

from rcgan_tpu.data.confusion import build_confusion

TRAIN_FILES = ["data_batch_1", "data_batch_2", "data_batch_3", "data_batch_4", "data_batch_5"]
TEST_FILES = ["test_batch"]
OUTPUT_DIM = 3072


@dataclasses.dataclass
class CifarSplit:
    images: np.ndarray  # [N, 3072] uint8, CHW-flattened (CIFAR pickle layout)
    labels: np.ndarray  # [N] int32 noisy observed labels ~ C[y]
    labels_actual: np.ndarray  # [N] int32 true labels (eval only)
    labels_random: np.ndarray  # [N] int32 generator labels (uniform)
    labels_biased: np.ndarray  # [N] int32 ~ C[labels_random]
    labels_inv_weights: np.ndarray  # [N, 10] float32 rows of C^-1

    def __len__(self):
        return len(self.images)

    def epoch(self, batch_size: int, shard: Tuple[int, int] = (0, 1)) -> Iterator[tuple]:
        """Reference ``get_epoch`` protocol.  ``shard=(i, n)`` yields the i-th
        of n contiguous per-host shards of every batch (multi-host input)."""
        i, n = shard
        for b in range(len(self.images) // batch_size):
            sl = slice(b * batch_size, (b + 1) * batch_size)
            per = batch_size // n
            ssl = slice(sl.start + i * per, sl.start + (i + 1) * per)
            yield (
                self.images[ssl],
                self.labels[ssl],
                self.labels_random[ssl],
                self.labels_biased[ssl],
                self.labels_inv_weights[ssl],
            )


def _unpickle(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    return d[b"data"], np.asarray(d[b"labels"])


def synthetic_cifar(n: int, seed: int = 0):
    """Smooth class-deterministic color blobs (CHW-flat uint8, CIFAR pickle
    layout).  Smooth/low-frequency on purpose — see
    ``data.mnist.synthetic_digits`` for why."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    templates = np.zeros((10, 3, 32, 32), np.float32)
    centers = rs.rand(10, 3, 2).astype(np.float32) * 24 + 4
    widths = (rs.rand(10, 3).astype(np.float32) * 4.0 + 3.0) ** 2
    colors = rs.rand(10, 3, 3).astype(np.float32)  # [class, blob, rgb]
    for c in range(10):
        for b in range(3):
            cy, cx = centers[c, b]
            blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * widths[c, b]))
            templates[c] += colors[c, b][:, None, None] * blob
    templates = np.clip(templates, 0.0, 1.0).reshape(10, OUTPUT_DIM)

    labels = rs.randint(10, size=n).astype(np.int64)
    gain = (0.75 + 0.5 * rs.rand(n, 1)).astype(np.float32)
    imgs = templates[labels] * gain + 0.02 * rs.randn(n, OUTPUT_DIM).astype(np.float32)
    return (np.clip(imgs, 0.0, 1.0) * 255).astype(np.uint8), labels


def _make_split(images, labels_actual, alpha: float, seed: int) -> CifarSplit:
    c, c_inv = build_confusion(alpha, 10)
    from rcgan_tpu import native

    labels, labels_random, labels_biased, inv_w = native.make_label_tuple(
        seed, labels_actual.astype(np.int32), c, c_inv, real_match=False
    )
    return CifarSplit(
        images=images,
        labels=labels,
        labels_actual=labels_actual.astype(np.int32),
        labels_random=labels_random,
        labels_biased=labels_biased,
        labels_inv_weights=inv_w,
    )


def load(
    data_dir: str,
    alpha: float,
    seed: int = 0,
    allow_synthetic: bool = True,
    synthetic_train_size: int = 50000,
    synthetic_test_size: int = 10000,
) -> Tuple[CifarSplit, CifarSplit]:
    """Returns (train, dev) splits with corrupted labels, matching
    ``cifar10/common/data/cifar10.py:48-52``."""

    def read(files):
        xs, ys = [], []
        for f in files:
            x, y = _unpickle(os.path.join(data_dir, f))
            xs.append(x)
            ys.append(y)
        return np.concatenate(xs, 0).astype(np.uint8), np.concatenate(ys, 0).astype(np.int64)

    have = all(os.path.exists(os.path.join(data_dir, f)) for f in TRAIN_FILES + TEST_FILES)
    if have:
        train_x, train_y = read(TRAIN_FILES)
        test_x, test_y = read(TEST_FILES)
    elif allow_synthetic:
        train_x, train_y = synthetic_cifar(synthetic_train_size, seed)
        test_x, test_y = synthetic_cifar(synthetic_test_size, seed + 7)
    else:
        raise FileNotFoundError(f"CIFAR-10 batches not found under {data_dir}")

    return (
        _make_split(train_x, train_y, alpha, seed + 1),
        _make_split(test_x, test_y, alpha, seed + 2),
    )


def dequantize_chw_to_hwc(x_int, key, img_size: int = 32, img_dim: int = 3):
    """On-device: uint8 CHW-flat → float HWC in [-1, 1) with uniform
    dequantization noise (``cifar10/gan_resnet.py:548-551``).  jit-safe."""
    import jax
    import jax.numpy as jnp

    x = 2.0 * (x_int.astype(jnp.float32) / 256.0 - 0.5)
    x = x + jax.random.uniform(key, x.shape, jnp.float32, 0.0, 1.0 / 128.0)
    x = x.reshape(-1, img_dim, img_size, img_size).transpose(0, 2, 3, 1)
    return x.reshape(-1, img_size * img_size * img_dim)
