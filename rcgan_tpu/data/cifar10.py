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


def synthetic_cifar(n: int, seed: int = 0, chunk: int = 4096, image_seed: int | None = None,
                    size: int = 32):
    """Memoized front of :func:`_render_synthetic_cifar` (same signature /
    same bit-exact output): rendering is pure host-side numpy and costs
    ~33 s per 50k 32px images (~3.4 min per 20k at 128px) at the start of
    every experiment in the chip window, so repeat invocations (sweep
    cells, crash-resume, debug reruns) are served from the on-disk cache
    (``data/_cache.py``; ``RCGAN_SYNTH_CACHE=0`` disables)."""
    iseed = seed if image_seed is None else image_seed
    from rcgan_tpu.data._cache import memoize_render

    return memoize_render(
        "cifar",
        dict(n=n, seed=seed, chunk=chunk, iseed=iseed, size=size),
        lambda: _render_synthetic_cifar(n, seed, chunk, image_seed, size),
        code_of=_render_synthetic_cifar,
    )


def _render_synthetic_cifar(n: int, seed: int = 0, chunk: int = 4096,
                            image_seed: int | None = None, size: int = 32):
    """Class-conditional image FAMILY with continuous intra-class variation
    (CHW-flat uint8, CIFAR pickle layout).

    Round-1 used 10 fixed smooth templates; at reference size (dim 128) the
    discriminator memorized them (hinge d_cost → 0 by ~10k iters) and the
    generator received saturated gradients, so full-size conditioning could
    not be demonstrated (VERDICT r1 item 1).  This generator draws every
    image from a per-class *distribution* instead of a template:

    - a smooth color-gradient background (class-tinted, random orientation);
    - two Gaussian blobs whose centers/widths/colors jitter around
      class-specific means (geometric + color intra-class variation);
    - an oriented sinusoidal grating at 2-6 cycles/image (mid-frequency
      content a deconv generator can reproduce, unlike the binary-mask noise
      documented in QUALITY.md round 1), with class-dependent orientation
      and per-image frequency/phase jitter.

    Effectively infinitely many "templates" per class: the discriminator
    cannot win by memorization, which keeps full-size D/G balanced, while
    class identity (blob layout + palette + grating orientation) stays
    trivially decodable for the pinned eval classifier.
    """
    # ``seed`` fixes the per-class DISTRIBUTION parameters; ``image_seed``
    # (default: seed) draws the per-image samples.  Train/test splits must
    # share ``seed`` (same classes!) and differ only in ``image_seed``.
    #
    # Class parameters are STRUCTURED, not random: an earlier draw of
    # random class params left several classes with weakly distinctive
    # layouts, and at full size the generator mode-collapsed exactly those
    # classes onto the distinctive ones (gen-label-acc plateau at 0.50 with
    # a block-structured confusion matrix).  Ring-placed blobs, evenly
    # spaced hues, and evenly spaced grating orientations give every class
    # the same margin from its neighbors; per-image jitter still provides
    # the intra-class variation that keeps D from memorizing.
    rs = np.random.RandomState(seed if image_seed is None else image_seed)
    odim = size * size * 3  # == OUTPUT_DIM at the CIFAR-native size=32
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size  # [0,1)

    def hue_rgb(h):  # [K] hues in [0,1) -> [K, 3] saturated RGB
        h = np.asarray(h, np.float32)[..., None] * 6.0
        return np.clip(np.abs((h + np.array([0.0, 4.0, 2.0], np.float32)) % 6.0 - 3.0) - 1.0,
                       0.0, 1.0).astype(np.float32)

    k = np.arange(10, dtype=np.float32)
    ang = k * (2 * np.pi / 10)
    cls_blob_centers = np.stack(
        [
            np.stack([0.5 + 0.27 * np.sin(ang), 0.5 + 0.27 * np.cos(ang)], -1),
            np.stack([0.5 + 0.14 * np.sin(ang + 2.4), 0.5 + 0.14 * np.cos(ang + 2.4)], -1),
        ],
        axis=1,
    ).astype(np.float32)  # [cls, blob, yx]
    cls_blob_colors = np.stack(
        [hue_rgb(k / 10) * 0.8 + 0.2, hue_rgb((k / 10 + 0.5) % 1.0) * 0.8 + 0.2], axis=1
    )  # [cls, blob, rgb]
    cls_bg_color = hue_rgb((k / 10 + 0.25) % 1.0) * 0.3
    cls_theta = (k * np.pi / 10).astype(np.float32)  # 18 deg apart
    cls_freq = (2.0 + (np.arange(10) % 4)).astype(np.float32)
    cls_grating_color = hue_rgb((k / 10 + 0.7) % 1.0) * 0.6 + 0.2

    labels = rs.randint(10, size=n).astype(np.int64)
    out = np.empty((n, odim), np.uint8)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        y = labels[lo:hi]
        img = np.empty((m, 3, size, size), np.float32)

        # background: smooth linear gradient in a random direction
        bg_theta = rs.rand(m, 1, 1).astype(np.float32) * (2 * np.pi)
        ramp = (xx * np.cos(bg_theta) + yy * np.sin(bg_theta) + 1.0) * 0.5  # [m,32,32]
        img[:] = cls_bg_color[y][:, :, None, None] * ramp[:, None]

        # two jittered class blobs
        for b in range(2):
            c_yx = cls_blob_centers[y, b] + rs.randn(m, 2).astype(np.float32) * 0.06
            width = (0.10 + 0.05 * rs.rand(m).astype(np.float32)) ** 2
            d2 = (yy - c_yx[:, 0, None, None]) ** 2 + (xx - c_yx[:, 1, None, None]) ** 2
            blob = np.exp(-d2 / (2 * width[:, None, None]))
            color = np.clip(
                cls_blob_colors[y, b] + 0.1 * rs.randn(m, 3).astype(np.float32), 0, 1
            )
            img += color[:, :, None, None] * blob[:, None]

        # oriented mid-frequency grating (jitter sigma 0.08 rad ~ 4.6 deg,
        # well inside the 18-deg class spacing)
        theta = cls_theta[y] + rs.randn(m).astype(np.float32) * 0.08
        freq = cls_freq[y] + rs.rand(m).astype(np.float32) - 0.5
        phase = rs.rand(m).astype(np.float32) * (2 * np.pi)
        carrier = np.sin(
            2 * np.pi * freq[:, None, None]
            * (xx * np.cos(theta)[:, None, None] + yy * np.sin(theta)[:, None, None])
            + phase[:, None, None]
        )
        img += 0.18 * cls_grating_color[y][:, :, None, None] * carrier[:, None]

        img += 0.02 * rs.randn(m, 3, size, size).astype(np.float32)
        out[lo:hi] = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8).reshape(m, odim)
    return out, labels


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
    noise_seed: int | None = None,
) -> Tuple[CifarSplit, CifarSplit]:
    """Returns (train, dev) splits with corrupted labels, matching
    ``cifar10/common/data/cifar10.py:48-52``.

    ``noise_seed`` (default: ``seed``) seeds only the label-corruption
    draw — replication runs vary it while keeping the image universe
    (and therefore the pinned eval classifiers) fixed."""

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
        # same class universe (seed), fresh image draws (image_seed)
        train_x, train_y = synthetic_cifar(synthetic_train_size, seed)
        test_x, test_y = synthetic_cifar(synthetic_test_size, seed, image_seed=seed + 7)
    else:
        raise FileNotFoundError(f"CIFAR-10 batches not found under {data_dir}")

    nseed = seed if noise_seed is None else noise_seed
    return (
        _make_split(train_x, train_y, alpha, nseed + 1),
        _make_split(test_x, test_y, alpha, nseed + 2),
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


def dequantize_chw_to_hwc_keys(x_int, keys, img_size: int = 32, img_dim: int = 3):
    """Per-example-keyed variant of :func:`dequantize_chw_to_hwc`:
    ``keys`` is [B] PRNG keys (see ``core.rng.example_keys``), so the noise
    an example receives is independent of how the batch is sharded —
    required for the tight DP-equivalence property (core/rng.py)."""
    import jax
    import jax.numpy as jnp

    d = x_int.shape[-1]
    x = 2.0 * (x_int.astype(jnp.float32) / 256.0 - 0.5)
    u = jax.vmap(lambda k: jax.random.uniform(k, (d,), jnp.float32, 0.0, 1.0 / 128.0))(keys)
    x = (x + u).reshape(-1, img_dim, img_size, img_size).transpose(0, 2, 3, 1)
    return x.reshape(-1, img_size * img_size * img_dim)
