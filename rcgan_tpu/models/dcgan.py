"""MNIST conditional DCGAN (reference: ``mnist/model.py:644-768``).

Generator: z‖y → FC(1024)+BN → FC(gf·2·7·7)+BN → deconv 14x14 → deconv 28x28
→ sigmoid, with the label concatenated at every stage.  The reference's
``gen_sampler`` (same weights, BN ``train=False``) is ``generator`` with
``train=False`` — no duplicate graph needed.

Discriminators: ``projection`` — 4x strided SN convs + BN + lrelu, global
mean-pool, projection logit ``h4 + Σ h3·linear(y)`` with optional one-hot
concat at chosen layers and unit-clip max-norm on the linears; ``vanilla`` —
the conv-cond-concat DCGAN head.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx
from rcgan_tpu.ops import (
    batch_norm,
    conv2d,
    conv_cond_concat,
    deconv2d,
    linear,
    lrelu,
)


@dataclasses.dataclass(frozen=True)
class DCGANConfig:
    batch_size: int = 100
    output_height: int = 28
    output_width: int = 28
    c_dim: int = 1
    y_dim: int = 10
    z_dim: int = 100
    gf_dim: int = 64
    df_dim: int = 64
    gfc_dim: int = 1024
    dfc_dim: int = 1024
    disc_type: str = "vanilla"  # vanilla | projection
    spectral_norm: bool = True
    max_norm: bool = True
    concat_y: bool = False
    concat_y_layers: Sequence[int] = (1,)


def generator(ctx: Ctx, cfg: DCGANConfig, z: jax.Array, y: jax.Array, train: bool = True):
    """``y`` is one-hot ``[B, y_dim]``.  ``train=False`` reproduces
    ``gen_sampler`` (``mnist/model.py:733-757``): BN uses moving stats and
    does not update them."""
    s_h, s_w = cfg.output_height, cfg.output_width
    s_h2, s_w2 = s_h // 2, s_w // 2
    s_h4, s_w4 = s_h // 4, s_w // 4

    b = z.shape[0]
    yb = y.reshape(b, 1, 1, cfg.y_dim)
    z = jnp.concatenate([z, y], axis=1)

    h0 = jax.nn.relu(batch_norm(ctx, linear(ctx, z, cfg.gfc_dim, "g_h0_lin"), "g_bn0", train=train))
    h0 = jnp.concatenate([h0, y], axis=1)

    h1 = jax.nn.relu(
        batch_norm(ctx, linear(ctx, h0, cfg.gf_dim * 2 * s_h4 * s_w4, "g_h1_lin"), "g_bn1", train=train)
    )
    h1 = h1.reshape(b, s_h4, s_w4, cfg.gf_dim * 2)
    h1 = conv_cond_concat(h1, yb)

    h2 = jax.nn.relu(batch_norm(ctx, deconv2d(ctx, h1, cfg.gf_dim * 2, "g_h2"), "g_bn2", train=train))
    assert h2.shape[1:3] == (s_h2, s_w2)
    h2 = conv_cond_concat(h2, yb)

    out = jax.nn.sigmoid(deconv2d(ctx, h2, cfg.c_dim, "g_h3"))
    assert out.shape[1:3] == (s_h, s_w)
    return out


def _projection_trunk(ctx: Ctx, cfg: DCGANConfig, image: jax.Array, yb):
    """Conv trunk of the projection discriminator → pooled features [B, df].
    ``yb=None`` skips the concat_y injections (label-independent trunk)."""

    def maybe_concat(h, layer_idx):
        if yb is not None and cfg.concat_y and layer_idx in cfg.concat_y_layers:
            return conv_cond_concat(h, yb)
        return h

    x = maybe_concat(image, 1)
    h0 = lrelu(conv2d(ctx, x, cfg.df_dim, "d_h0_conv", spectral_norm=cfg.spectral_norm))
    h0 = maybe_concat(h0, 2)
    h1 = lrelu(
        batch_norm(ctx, conv2d(ctx, h0, cfg.df_dim, "d_h1_conv", spectral_norm=cfg.spectral_norm), "d_bn1")
    )
    h1 = maybe_concat(h1, 3)
    h2 = lrelu(
        batch_norm(ctx, conv2d(ctx, h1, cfg.df_dim, "d_h2_conv", spectral_norm=cfg.spectral_norm), "d_bn2")
    )
    h2 = maybe_concat(h2, 4)
    h3 = lrelu(
        batch_norm(ctx, conv2d(ctx, h2, cfg.df_dim, "d_h3_conv", spectral_norm=cfg.spectral_norm), "d_bn3")
    )
    return jnp.mean(h3, axis=(1, 2))  # [B, df]


def discriminator(ctx: Ctx, cfg: DCGANConfig, image: jax.Array, y: jax.Array):
    """Returns ``(sigmoid(logits), logits)`` with logits shape ``[B, 1]``."""
    b = image.shape[0]
    yb = y.reshape(b, 1, 1, cfg.y_dim)

    if cfg.disc_type == "projection":
        h3 = _projection_trunk(ctx, cfg, image, yb if cfg.concat_y else None)
        h4 = linear(ctx, h3.reshape(b, -1), 1, "d_h4_lin", max_norm=cfg.max_norm)
        h5 = linear(ctx, y.reshape(b, cfg.y_dim), cfg.df_dim, "d_h5_y_lin", max_norm=cfg.max_norm)
        h6 = h4 + jnp.sum(h3 * h5, axis=1, keepdims=True)
        return jax.nn.sigmoid(h6), h6

    # vanilla conv-cond-concat head
    x = conv_cond_concat(image, yb)
    h0 = lrelu(conv2d(ctx, x, cfg.c_dim + cfg.y_dim, "d_h0_conv"))
    h0 = conv_cond_concat(h0, yb)

    h1 = lrelu(batch_norm(ctx, conv2d(ctx, h0, cfg.df_dim + cfg.y_dim, "d_h1_conv"), "d_bn1"))
    h1 = h1.reshape(b, -1)
    h1 = jnp.concatenate([h1, y], axis=1)

    h3 = lrelu(batch_norm(ctx, linear(ctx, h1, cfg.dfc_dim, "d_h3_lin"), "d_bn2"))
    h3 = jnp.concatenate([h3, y], axis=1)

    h4 = linear(ctx, h3, 1, "d_h4_lin")
    return jax.nn.sigmoid(h4), h4


def discriminator_all_labels(ctx: Ctx, cfg: DCGANConfig, image: jax.Array) -> jax.Array:
    """Logits of D evaluated at *every* one-hot label: ``[B, y_dim]``.

    The reference builds 10 separate D towers and concats
    (``mnist/model.py:153-174,183-204``).  When the trunk is
    label-independent (projection D without concat_y — the shipped unbiased
    config) we factorize: one trunk pass + a ``[y_dim, df]`` label matrix,
    a 10x compute saving that is exactly equal in value.  When labels DO
    enter the trunk (vanilla D, concat_y) we evaluate per label exactly as
    the reference does — batch-norm moments there are per-label-call, which
    a tiled batch would NOT reproduce (label channels change the
    activations feeding BN).
    """
    b = image.shape[0]
    eye = jnp.eye(cfg.y_dim, dtype=image.dtype)

    if cfg.disc_type == "projection" and not cfg.concat_y:
        h3 = _projection_trunk(ctx, cfg, image, None)
        h4 = linear(ctx, h3, 1, "d_h4_lin", max_norm=cfg.max_norm)  # [B, 1]
        h5_all = linear(ctx, eye, cfg.df_dim, "d_h5_y_lin", max_norm=cfg.max_norm)  # [y, df]
        return h4 + h3 @ h5_all.T  # [B, y_dim]

    # general path: one D tower per label, like the reference's 10 replicas
    cols = []
    for i in range(cfg.y_dim):
        y = jnp.broadcast_to(eye[i], (b, cfg.y_dim))
        _, logits = discriminator(ctx, cfg, image, y)
        cols.append(logits[:, 0])
    return jnp.stack(cols, axis=1)  # [B, y_dim]


def classifier(ctx: Ctx, cfg: DCGANConfig, x: jax.Array):
    """Permutation-regularizer aux classifier: one linear layer
    (``mnist/model.py:759-768``).  Lives under a ``d_`` name so it trains
    with the discriminator optimizer, as in the reference."""
    b = x.shape[0]
    return linear(ctx, x.reshape(b, -1), cfg.y_dim, "d_classifier_h1")
