"""Qualitative visualization utilities (reference: ``mnist/utils.py`` —
``visualize`` options 0-4 z-space walks, ``make_gif``, ``show_all_variables``).

``visualize`` renders generator outputs while sweeping one z coordinate at a
time (the classic DCGAN interpolation diagnostics); ``make_gif`` animates
them; ``show_all_variables`` is the parameter census the reference prints at
startup (``mnist/utils.py:21-23``).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Sequence

import numpy as np

from rcgan_tpu.core.module import Params, count_params
from rcgan_tpu.utils.images import image_manifold_size, merge, save_images

log = logging.getLogger(__name__)


def show_all_variables(params: Params) -> int:
    """Log every layer's variable shapes + total count; returns the total."""
    total = 0
    for layer in sorted(params):
        for name, arr in sorted(params[layer].items()):
            log.info("%s/%s %s (%d)", layer, name, tuple(arr.shape), arr.size)
            total += arr.size
    log.info("Total params: %d", total)
    assert total == count_params(params)
    return total


def make_gif(images: Sequence[np.ndarray], fname: str, duration_ms: int = 120):
    """Animated GIF from a list of [H, W, C] float [0,1] or uint8 frames."""
    from PIL import Image

    frames = []
    for im in images:
        arr = np.asarray(im)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        frames.append(Image.fromarray(arr))
    frames[0].save(
        fname, save_all=True, append_images=frames[1:], duration=duration_ms, loop=0
    )


def visualize(
    sampler: Callable[[np.ndarray, np.ndarray], np.ndarray],
    z_dim: int,
    y_dim: int,
    batch_size: int,
    out_dir: str,
    option: int = 1,
    n_frames: int = 10,
    seed: int = 0,
):
    """z-space sweep grids.  ``sampler(z, y_onehot) -> images [B,H,W,C]``.

    option 0: one random grid.
    option 1: sweep each of ``n_frames`` z-dims across [-1, 1], one PNG per dim.
    option 2: same sweep rendered as an animated GIF per dim.
    option 3: zero-base sweep — for each z dim, the BATCH axis sweeps that
      coordinate across [0, 1) from z=0; one GIF per dim whose frames are the
      batch examples (``mnist/utils.py:219-228``).
    option 4: option 3's sweep for every dim, plus a merged forward+reverse
      GIF whose frames are grids of all dims at one sweep position
      (``mnist/utils.py:229-243``).
    """
    os.makedirs(out_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    y = np.eye(y_dim, dtype=np.float32)[np.arange(batch_size) % y_dim]

    if option == 0:
        z = rs.uniform(-1, 1, (batch_size, z_dim)).astype(np.float32)
        samples = np.asarray(sampler(z, y))
        save_images(samples, image_manifold_size(batch_size), os.path.join(out_dir, "test.png"))
        return

    if option in (3, 4):
        values = np.arange(0, 1, 1.0 / batch_size, dtype=np.float32)
        image_set = []
        for dim in range(z_dim):
            z = np.zeros((batch_size, z_dim), np.float32)
            z[:, dim] = values
            samples = np.asarray(sampler(z, y))
            image_set.append(samples)
            make_gif(list(samples), os.path.join(out_dir, f"test_gif_{dim}.gif"))
        if option == 4:
            gh, gw = image_manifold_size(z_dim)
            n_pos = min(64, batch_size)
            idxs = list(range(n_pos)) + list(range(n_pos - 1, -1, -1))
            frames = [
                merge(np.asarray([images[k] for images in image_set]), (gh, gw))
                for k in idxs
            ]
            make_gif(
                [f[..., None] if f.ndim == 2 else f for f in frames],
                os.path.join(out_dir, "test_gif_merged.gif"),
                duration_ms=max(1, 8000 // len(frames)),
            )
        return

    base_z = rs.uniform(-1, 1, (batch_size, z_dim)).astype(np.float32)
    for dim in range(min(n_frames, z_dim)):
        frames = []
        for v in np.linspace(-1.0, 1.0, n_frames):
            z = base_z.copy()
            z[:, dim] = v
            samples = np.asarray(sampler(z, y))
            frames.append(merge(samples, image_manifold_size(batch_size)))
        if option == 1:
            save_images(
                np.stack([frames[-1]])[..., None] if frames[-1].ndim == 2 else np.stack([frames[-1]]),
                (1, 1),
                os.path.join(out_dir, f"test_arange_{dim}.png"),
            )
        else:
            make_gif(
                [f[..., None] if f.ndim == 2 else f for f in frames],
                os.path.join(out_dir, f"test_gif_{dim}.gif"),
            )
