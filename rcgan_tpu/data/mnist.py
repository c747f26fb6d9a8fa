"""MNIST loader + noisy-label pipeline (reference: ``mnist/model.py:770-834``).

Reads the raw idx files (train+test concatenated to 70k examples, fixed
seed-547 shuffle), builds C / C^-1, and produces the 5-tuple of label
variants with a single vectorized pass instead of the reference's
per-example ``np.random.multinomial`` loop.

When the idx files are absent (this box has zero egress), a deterministic
synthetic digit set with the same shapes/dtypes keeps the full pipeline,
tests, and benchmarks runnable; real data drops in without code changes.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from rcgan_tpu.data.confusion import build_confusion


@dataclasses.dataclass
class MnistData:
    x: np.ndarray  # [N, 28, 28, 1] float32 in [0, 1]
    y_actual: np.ndarray  # [N] int32 true labels (held out; eval only)
    y_real: np.ndarray  # [N] int32 observed noisy labels ~ C[y_actual]
    y_gen: np.ndarray  # [N] int32 generator labels
    y_fake: np.ndarray  # [N] int32 ~ C[y_gen] (RCGAN corruption)
    y_real_weights: np.ndarray  # [N, 10] float32 rows of C^-1
    confusion: np.ndarray  # [10, 10] the true C
    confusion_inv: np.ndarray

    def __len__(self):
        return len(self.x)


def _read_idx_images(path: str, n: int) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    return raw[16:].reshape(n, 28, 28, 1)


def _read_idx_labels(path: str, n: int) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    return raw[8:].reshape(n)


def synthetic_digits(n: int = 70000, seed: int = 0):
    """Memoized front of :func:`_render_synthetic_digits` (bit-exact):
    the 70k render costs ~17 s of host time at every MNIST run start, so
    repeats are served from the on-disk cache (``data/_cache.py``;
    ``RCGAN_SYNTH_CACHE=0`` disables)."""
    from rcgan_tpu.data._cache import memoize_render

    return memoize_render(
        "mnist", dict(n=n, seed=seed),
        lambda: _render_synthetic_digits(n, seed),
        code_of=_render_synthetic_digits,
    )


def _render_synthetic_digits(n: int = 70000, seed: int = 0):
    """Class-identifiable fake digits: smooth class-deterministic Gaussian
    blobs with small per-example jitter.  Smoothness matters: deconvolution
    generators reproduce low-frequency shapes well, so GAN quality metrics
    (gen-label accuracy, recovery) are meaningful on this stand-in data —
    binary noise templates are not learnable by a DCGAN and flatline them."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    # 3 blobs per class at class-deterministic locations/widths
    centers = rs.rand(10, 3, 2).astype(np.float32) * 20 + 4
    widths = (rs.rand(10, 3).astype(np.float32) * 3.0 + 2.0) ** 2
    templates = np.zeros((10, 28, 28), np.float32)
    for c in range(10):
        for b in range(3):
            cy, cx = centers[c, b]
            templates[c] += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * widths[c, b]))
    templates = np.clip(templates, 0.0, 1.0)

    labels = rs.randint(10, size=n).astype(np.int64)
    # per-example jitter: global intensity + tiny spatial shift
    gain = (0.8 + 0.4 * rs.rand(n, 1, 1)).astype(np.float32)
    shifts = rs.randint(-2, 3, size=(n, 2))
    imgs = templates[labels] * gain
    imgs = np.stack([np.roll(im, tuple(s), axis=(0, 1)) for im, s in zip(imgs, shifts)])
    imgs = np.clip(imgs + 0.03 * rs.randn(n, 28, 28).astype(np.float32), 0.0, 1.0)
    return (imgs[..., None] * 255).astype(np.uint8), labels


def load_mnist(
    data_dir: str,
    alpha: float,
    class_depend: bool = False,
    real_match: bool = False,
    seed: int = 547,
    allow_synthetic: bool = True,
) -> MnistData:
    files = [
        "train-images-idx3-ubyte",
        "train-labels-idx1-ubyte",
        "t10k-images-idx3-ubyte",
        "t10k-labels-idx1-ubyte",
    ]
    paths = [os.path.join(data_dir, "mnist", f) for f in files]
    if all(os.path.exists(p) for p in paths):
        tr_x = _read_idx_images(paths[0], 60000)
        tr_y = _read_idx_labels(paths[1], 60000)
        te_x = _read_idx_images(paths[2], 10000)
        te_y = _read_idx_labels(paths[3], 10000)
        x = np.concatenate([tr_x, te_x], axis=0)
        y = np.concatenate([tr_y, te_y], axis=0).astype(np.int64)
    elif allow_synthetic:
        x, y = synthetic_digits()
    else:
        raise FileNotFoundError(f"MNIST idx files not found under {data_dir}/mnist")

    # Fixed-seed shuffle, matching mnist/model.py:795-799.
    rs = np.random.RandomState(seed)
    perm = rs.permutation(len(x))
    x, y = x[perm], y[perm]

    c, c_inv = build_confusion(alpha, 10, class_depend)
    from rcgan_tpu import native

    y_real, y_gen, y_fake, y_w = native.make_label_tuple(
        seed + 1, y.astype(np.int32), c, c_inv, real_match=real_match
    )
    return MnistData(
        x=(x.astype(np.float32) / 255.0),
        y_actual=y.astype(np.int32),
        y_real=y_real,
        y_gen=y_gen,
        y_fake=y_fake,
        y_real_weights=y_w,
        confusion=c.astype(np.float32),
        confusion_inv=c_inv.astype(np.float32),
    )


def renoise_labels(
    rng: np.random.RandomState,
    data: MnistData,
    noise_c: np.ndarray,
):
    """RCGAN+y epoch-level re-noising (``mnist/model.py:320-333``): re-corrupt
    the *already noisy* y_real / y_fake through an annealed matrix.  Returns
    new (y_real, y_fake) without mutating ``data``."""
    cdf = np.cumsum(noise_c, axis=-1)
    n = len(data)
    y_real = (rng.rand(n, 1) > cdf[data.y_real]).sum(axis=-1).astype(np.int32)
    y_fake = (rng.rand(n, 1) > cdf[data.y_fake]).sum(axis=-1).astype(np.int32)
    return y_real, y_fake


def noise_schedule_alpha(
    epoch: int,
    alpha: float,
    noise_alpha: float,
    noise_start: int,
    noise_end: int,
    n_classes: int = 10,
) -> float:
    """The annealed effective-noise schedule of ``mnist/model.py:293-318``.

    Returns the *relative* coin weight applied on top of the already-noisy
    labels for this epoch (1.0 = no extra noise).
    """
    uniform = (1.0 - alpha) / (n_classes - 1)
    alpha_start = min(1.0, (noise_alpha - uniform) / (alpha - uniform))
    if noise_alpha > 0.9:
        raise ValueError(f"effective noise alpha {noise_alpha} > 0.9")
    if alpha_start == 1.0:
        end_epoch = noise_start
    else:
        end_epoch = noise_start + (noise_end - noise_start) / (0.9 - noise_alpha) * (
            alpha - noise_alpha
        )
        end_epoch = min(noise_end, end_epoch)
    if epoch < noise_start:
        out = alpha_start
    elif epoch < end_epoch:
        out = alpha_start + (1.0 - alpha_start) * (epoch - noise_start) / (end_epoch - noise_start)
    else:
        out = 1.0
    return min(1.0, out)
