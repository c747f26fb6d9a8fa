"""cGAN label recovery (reference: ``DCGAN.recover_labels``,
``mnist/model.py:494-640``).

Given a trained generator and a batch of real images with unknown labels,
optimize per-example ``(z, y_logits)`` so that the softmax-weighted MSE
between the image and ``G(z, one_hot(k))`` over all classes k is minimal:

    loss = mean_i Σ_k softmax(y_logits_i)_k · mean((x_i − G(z_ik, e_k))²)

Plain SGD (reference: lr 5e2, 1000 steps, batch 500) — here the whole loop
is a single jitted ``lax.scan`` on device instead of 1000 feed_dict steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RecoverConfig:
    batch_size: int = 500
    epochs: int = 1000
    learning_rate: float = 5.0e2
    y_dim: int = 10
    z_dim: int = 100


def recover_labels(
    sampler: Callable[[jax.Array, jax.Array], jax.Array],
    images: jax.Array,
    y_actual: jax.Array,
    cfg: RecoverConfig,
    rng: jax.Array,
) -> Tuple[np.ndarray, dict]:
    """``sampler(z, y_onehot)`` is the frozen generator (BN inference mode).

    ``images``: [B, H, W, C]; ``y_actual``: [B] int (eval only).
    Returns (recovered labels [B], metrics with mse/zero-one trajectories).
    """
    b, y_dim, z_dim = cfg.batch_size, cfg.y_dim, cfg.z_dim
    assert images.shape[0] == b

    # trainables: y_logit_recover [B, y], z_recover [B*y, z]
    # (mnist/model.py:518-531; TF default glorot-uniform init)
    k1, k2 = jax.random.split(rng)
    lim_y = np.sqrt(6.0 / (b + y_dim))
    y_logits0 = jax.random.uniform(k1, (b, y_dim), jnp.float32, -lim_y, lim_y)
    lim_z = np.sqrt(6.0 / (b * y_dim + z_dim))
    z0 = jax.random.uniform(k2, (b * y_dim, z_dim), jnp.float32, -lim_z, lim_z)

    hard_y = jnp.tile(jnp.eye(y_dim, dtype=jnp.float32), (b, 1))  # [B*y, y]
    imgs = images.astype(jnp.float32)

    def loss_fn(z, y_logits):
        y_recover = jax.nn.softmax(y_logits, axis=-1)  # [B, y]
        gen = sampler(z, hard_y)  # [B*y, H, W, C]
        gen = gen.reshape((b, y_dim) + imgs.shape[1:])
        sq = jnp.mean((imgs[:, None] - gen) ** 2, axis=(-1, -2, -3))  # [B, y]
        return jnp.mean(jnp.sum(sq * y_recover, axis=-1))

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def step(carry, _):
        z, y_logits = carry
        mse, (gz, gy) = grad_fn(z, y_logits)
        z = z - cfg.learning_rate * gz
        y_logits = y_logits - cfg.learning_rate * gy
        zero_one = jnp.mean(jnp.argmax(y_logits, -1) != y_actual)
        return (z, y_logits), (mse, zero_one)

    (z, y_logits), (mses, zero_ones) = jax.lax.scan(
        jax.jit(step), (z0, y_logits0), None, length=cfg.epochs
    )

    recovered = np.asarray(jnp.argmax(y_logits, axis=-1))
    metrics = {
        "mse": np.asarray(mses),
        "zero_one": np.asarray(zero_ones),
        "accuracy": float((recovered == np.asarray(y_actual)).mean()),
        "y_recover": np.asarray(jax.nn.softmax(y_logits, axis=-1)),
        "z_recover": np.asarray(z),
    }
    return recovered, metrics


def render_wrong_image_diagnostics(
    sampler,
    images: np.ndarray,
    y_actual: np.ndarray,
    y_recover: np.ndarray,
    z_recover: np.ndarray,
    out_path: str,
    n_wrong: int = 15,
):
    """The reference's wrong-image diagnostic panel
    (``mnist/model.py:550-596``): for the ``n_wrong`` examples with the
    largest |softmax(y_recover) − onehot(y_actual)| gap, render
    [true-label bar | real image | best reconstructed image | recovered bar]
    side by side as one PNG."""
    from PIL import Image

    b, y_dim = y_recover.shape
    gap = np.abs(y_recover - np.eye(y_dim)[y_actual]).sum(axis=-1)
    idx = np.argsort(-gap)[:n_wrong]

    h, w = images.shape[1:3]

    def bar(probs):
        # horizontal bar chart: one row band per class, filled ∝ probability
        img = np.zeros((h, 50), np.float32)
        band = max(1, h // y_dim)
        for k, p in enumerate(probs):
            img[k * band : (k + 1) * band, : int(round(p * 50))] = 1.0
        return img

    rows = []
    for i in idx:
        best_k = int(np.argmax(y_recover[i]))
        z = z_recover.reshape(b, y_dim, -1)[i, best_k][None]
        y = np.eye(y_dim, dtype=np.float32)[best_k][None]
        recon = np.asarray(sampler(z, y))[0, ..., 0]
        real = images[i, ..., 0]
        true_bar = bar(np.eye(y_dim)[y_actual[i]])
        rec_bar = bar(y_recover[i])
        rows.append(np.concatenate([true_bar, real, recon, rec_bar], axis=1))
    panel = np.concatenate(rows, axis=0)
    Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(out_path)
    return panel
