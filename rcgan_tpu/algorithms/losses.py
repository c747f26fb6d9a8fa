"""GAN loss zoo — elementwise forms so noisy-label modes can importance-weight
before reducing.

MNIST variants (``mnist/model.py:135-147``): 'hinge', 'ce'.
CIFAR variants (``cifar10/gan_resnet.py:591-612,661-681,742-778``):
'Goodfellow', 'HINGE', 'WGAN', each with a soft-plus flavor, plus the
vendored loss zoo of ``cifar10/common/misc.py`` ('WGAN-GP', 'LSGAN',
'CGAN', 'MiniMax') for capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_ce(logits, targets):
    """tf.nn.sigmoid_cross_entropy_with_logits (computed in float32)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _log_sigmoid(x):
    return jax.nn.log_sigmoid(x)


def d_real_loss(logits, loss_type: str, soft_plus: bool = False):
    """Per-element discriminator loss on real-data logits."""
    logits = logits.astype(jnp.float32)
    lt = loss_type.lower()
    if lt in ("hinge",):
        base = jax.nn.relu(1.0 - logits)
        return jax.nn.softplus(-jnp.minimum(0.0, -1.0 + logits)) if soft_plus else base
    if lt in ("ce", "goodfellow", "minimax"):
        base = -_log_sigmoid(logits)  # == sigmoid CE vs ones
        return jax.nn.softplus(_log_sigmoid(logits)) * -1.0 if soft_plus else base
    if lt in ("wgan", "wgan-gp"):
        return jax.nn.softplus(-logits) if soft_plus else -logits
    if lt == "lsgan":
        return jnp.square(logits - 1.0)
    raise ValueError(f"Unknown loss_type {loss_type!r}")


def d_fake_loss(logits, loss_type: str, soft_plus: bool = False):
    logits = logits.astype(jnp.float32)
    lt = loss_type.lower()
    if lt == "hinge":
        base = jax.nn.relu(1.0 + logits)
        return jax.nn.softplus(-jnp.minimum(0.0, -1.0 - logits)) if soft_plus else base
    if lt in ("ce", "goodfellow", "minimax"):
        # -log(1 - sigmoid(x)) == softplus(x), numerically stable
        base = jax.nn.softplus(logits)
        # soft_plus flavor: -softplus(log(1 - sigmoid(x))) == -softplus(-softplus(x))
        return -jax.nn.softplus(-base) if soft_plus else base
    if lt in ("wgan", "wgan-gp"):
        return jax.nn.softplus(logits) if soft_plus else logits
    if lt == "lsgan":
        return jnp.square(logits)
    raise ValueError(f"Unknown loss_type {loss_type!r}")


def g_loss(logits, loss_type: str, soft_plus: bool = False):
    """Per-element generator loss on fake-data logits."""
    logits = logits.astype(jnp.float32)
    lt = loss_type.lower()
    if lt == "hinge":
        return jax.nn.softplus(-logits) if soft_plus else -logits
    if lt in ("ce", "goodfellow", "minimax"):
        base = -_log_sigmoid(logits)  # == sigmoid CE vs ones == softplus(-x)
        return jax.nn.softplus(base) if soft_plus else base
    if lt in ("wgan", "wgan-gp"):
        return jax.nn.softplus(-logits) if soft_plus else -logits
    if lt == "lsgan":
        return jnp.square(logits - 1.0)
    raise ValueError(f"Unknown loss_type {loss_type!r}")


def get_loss(disc_real, disc_fake, loss_type: str = "HINGE", soft_plus: bool = False,
             d_apply=None, real=None, fake=None, key=None):
    """(gen_cost, disc_cost) pairs for the vendored loss zoo
    (``cifar10/common/misc.py`` get_loss: HINGE/WGAN/WGAN-GP/LSGAN/CGAN/
    MiniMax).  ``WGAN-GP`` needs ``d_apply``/``real``/``fake``/``key`` for
    the gradient penalty."""
    lt = loss_type.lower()
    if lt == "cgan":
        lt = "goodfellow"  # conditional GAN uses the standard CE objective
    gen_cost = jnp.mean(g_loss(disc_fake, lt, soft_plus))
    disc_cost = jnp.mean(d_real_loss(disc_real, lt, soft_plus)) + jnp.mean(
        d_fake_loss(disc_fake, lt, soft_plus)
    )
    if loss_type.upper() == "WGAN-GP":
        assert d_apply is not None and real is not None and fake is not None and key is not None
        disc_cost = disc_cost + wgan_gp_penalty(d_apply, real, fake, key)
    return gen_cost, disc_cost


def wgan_gp_penalty(d_apply, real, fake, key, lamb: float = 10.0):
    """Gradient penalty for WGAN-GP (vendored loss zoo,
    ``cifar10/common/misc.py`` get_loss): E[(||∇D(x̂)||₂ − 1)²] on random
    interpolates."""
    eps = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    x_hat = eps * real + (1.0 - eps) * fake

    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads).reshape(grads.shape[0], -1), axis=-1) + 1e-12)
    return lamb * jnp.mean(jnp.square(norms - 1.0))
