"""Image grid/save utilities (reference: ``mnist/utils.py:21-250``,
``cifar10/common/misc.py`` save_images)."""

from __future__ import annotations

import math

import numpy as np


def image_manifold_size(num_images: int):
    h = int(math.floor(np.sqrt(num_images)))
    w = int(math.ceil(np.sqrt(num_images)))
    assert h * w == num_images, "manifold size needs a square count"
    return h, w


def merge(images: np.ndarray, size) -> np.ndarray:
    """Tile [N, H, W, C] into one [size0*H, size1*W, C] grid."""
    h, w = images.shape[1], images.shape[2]
    c = images.shape[3] if images.ndim == 4 else 1
    img = np.zeros((int(h * size[0]), int(w * size[1]), c), dtype=images.dtype)
    for idx, image in enumerate(images):
        i = idx % size[1]
        j = idx // size[1]
        img[j * h : j * h + h, i * w : i * w + w] = image.reshape(h, w, c)
    return img if c > 1 else img[..., 0]


def save_images(images: np.ndarray, size, path: str):
    """``images`` in [0,1] float or uint8; writes a PNG grid."""
    from PIL import Image

    grid = merge(np.asarray(images), size)
    if grid.dtype != np.uint8:
        grid = (np.clip(grid, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(grid).save(path)


def save_cifar_samples(samples_flat: np.ndarray, path: str, img_size: int = 32, img_dim: int = 3):
    """[-1,1] flat generator output → uint8 grid PNG
    (``gan_resnet.py:829-833``)."""
    n = samples_flat.shape[0]
    imgs = ((samples_flat + 1.0) * (255.0 / 2)).astype(np.uint8)
    imgs = imgs.reshape(n, img_size, img_size, img_dim)
    save_images(imgs, image_manifold_size(n), path)


def to_uint8_samples(samples_flat: np.ndarray, img_size: int = 32, img_dim: int = 3) -> np.ndarray:
    """``((x+1)*255.99/2).astype(int)`` reshape, as fed to the label-accuracy
    classifier (``gan_resnet.py:850-861``)."""
    out = ((samples_flat + 1.0) * (255.99 / 2)).astype(np.int32)
    return out.reshape(-1, img_size, img_size, img_dim)
