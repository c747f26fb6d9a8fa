"""Confusion-matrix construction and vectorized noisy-label corruption.

The reference builds a one-coin confusion matrix
``C = ((1-a)/(K-1)) 11^T + (a - (1-a)/(K-1)) I`` (``mnist/model.py:807-809``,
``cifar10/gan_resnet.py:106``) and optionally a class-dependent variant
(``mnist/model.py:811-816``), then corrupts labels with O(dataset) Python
loops of ``np.random.multinomial`` (``mnist/model.py:821-832``,
``cifar10/common/data/cifar10.py:35-38``).  Here corruption is one vectorized
categorical sample — identical distribution, orders of magnitude faster — and
can also run on-device inside a jitted step (RCGAN+y's per-epoch re-noising).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def one_coin_matrix(alpha: float, n_classes: int = 10) -> np.ndarray:
    """P(observed=j | true=i): diagonal alpha, off-diagonal (1-alpha)/(K-1)."""
    k = n_classes
    return ((1.0 - alpha) / (k - 1)) * np.ones((k, k)) + (
        alpha - (1.0 - alpha) / (k - 1)
    ) * np.eye(k)


def class_dependent_matrix(alpha: float, n_classes: int = 10) -> np.ndarray:
    """Class-dependent rows: diagonals linspace(0.15, -0.15+2*alpha) over the
    default 50 linspace points, first ``n_classes`` used — reproducing
    ``mnist/model.py:811-816`` exactly (including its quirky default-num
    linspace)."""
    c = np.zeros((n_classes, n_classes))
    mean_diag = np.linspace(0.15, -0.15 + 2 * alpha)  # default num=50
    for i in range(n_classes):
        c[i, :] = (1.0 - mean_diag[i]) / (n_classes - 1)
        c[i, i] = mean_diag[i]
    return c


def build_confusion(alpha: float, n_classes: int = 10, class_depend: bool = False):
    c = class_dependent_matrix(alpha, n_classes) if class_depend else one_coin_matrix(alpha, n_classes)
    return c, np.linalg.inv(c)


def corrupt_labels(key: jax.Array, labels: jax.Array, c: jax.Array) -> jax.Array:
    """Sample ``out[i] ~ Categorical(C[labels[i]])`` in one fused op."""
    logits = jnp.log(jnp.maximum(c, 1e-30))
    return jax.random.categorical(key, logits[labels], axis=-1)


def make_label_tuple(
    key: jax.Array,
    y_actual: jax.Array,
    c: jax.Array,
    c_inv: jax.Array,
    real_match: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Produce the per-example label variants of SURVEY §0:

    Returns ``(y_real, y_gen, y_fake, y_real_weights)`` where
      * ``y_real ~ C[y_actual]`` — observed noisy label,
      * ``y_gen`` — uniform random generator label (or ``y_real`` when
        ``real_match``, ``mnist/model.py:828-830``),
      * ``y_fake ~ C[y_gen]`` — the RCGAN corruption of the generator label,
      * ``y_real_weights = C^{-1}[y_real]`` — unbiased-mode importance weights.
    All labels are integer ids; one-hot encoding happens at the loss site.
    """
    k_real, k_gen, k_fake = jax.random.split(key, 3)
    n = y_actual.shape[0]
    n_classes = c.shape[0]
    y_real = corrupt_labels(k_real, y_actual, c)
    if real_match:
        y_gen = y_real
    else:
        y_gen = jax.random.randint(k_gen, (n,), 0, n_classes)
    y_fake = corrupt_labels(k_fake, y_gen, c)
    y_real_weights = jnp.take(c_inv, y_real, axis=0)
    return y_real, y_gen, y_fake, y_real_weights


def corrupt_dataset_numpy(
    rng: np.random.RandomState,
    y_actual: np.ndarray,
    c: np.ndarray,
    c_inv: np.ndarray,
    real_match: bool = False,
):
    """Host-side vectorized equivalent of the reference's load-time loops."""
    n = len(y_actual)
    k = c.shape[0]
    cdf = np.cumsum(c, axis=-1)
    u = rng.rand(n, 1)
    y_real = (u > cdf[y_actual]).sum(axis=-1)
    y_gen = y_real if real_match else rng.randint(k, size=n)
    u2 = rng.rand(n, 1)
    y_fake = (u2 > cdf[y_gen]).sum(axis=-1)
    return y_real.astype(np.int32), y_gen.astype(np.int32), y_fake.astype(np.int32), c_inv[y_real].astype(np.float32)
