"""Progressive-growing GAN model family — the vendored-but-unused capability
envelope of the reference (``cifar10/common/resnet_block.py:192-349``):
ResNet G/D with progressive resolution doubling and fade-in blending.

The reference keeps this as dead library surface; here it is a working
optional zoo: ``generator``/``discriminator`` take a ``trans``/``alpha``
fade-in pair and blend the new highest-resolution block with an upsampled
(resp. pooled) shortcut, exactly the PGGAN schedule.  Resolution is the only
scaling hook the reference repo has (SURVEY §5.7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx
from rcgan_tpu.models.resnet_gan import ResnetGANConfig, nonlinearity, residual_block
from rcgan_tpu.ops import conv2d_lib, embed_y, linear_lib, mean_pool, pixel_norm, upsample_depth_to_space


@dataclasses.dataclass(frozen=True)
class PGGANConfig:
    z_dim: int = 128
    dim: int = 128
    img_dim: int = 3
    base_size: int = 4
    max_stage: int = 3  # 4->8->16->32
    use_pixel_norm: bool = True
    # Conditional critic: a projection head on the pooled features (same
    # design as the main stack's projection discriminator,
    # ``gan_resnet.py:414-421``).  The generator is label-conditioned via
    # cond-BN either way; without this the critic is blind to labels and
    # conditioning has NO training signal (gen-label-acc stays at chance —
    # observed in the round-3 unconditional 64x64 run).
    conditional: bool = True


def _to_rgb(ctx, cfg, x, stage):
    return conv2d_lib(ctx, x, x.shape[-1], cfg.img_dim, 1, 1, f"PG.G.ToRGB.{stage}",
                      he_init=False)


def _from_rgb(ctx, cfg, x, stage, dim):
    # spectral-normed like every other critic layer: an unconstrained
    # input conv breaks the Lipschitz chain and lets the critic saturate
    # the hinge (d_cost -> 0 observed from stage 3 on without it)
    return conv2d_lib(ctx, x, cfg.img_dim, dim, 1, 1, f"PG.D.FromRGB.{stage}",
                      spectral_normed=True)


def generator(ctx: Ctx, cfg: PGGANConfig, base: ResnetGANConfig, z: jax.Array,
              labels: jax.Array, stage: int, trans: bool = False, alpha: float = 1.0):
    """Progressive generator up to ``stage`` doublings of the base 4x4 grid.
    During transition (``trans``), output = alpha*new + (1-alpha)*upsampled
    previous-resolution RGB."""
    g = cfg.dim
    out = linear_lib(ctx, z, cfg.z_dim, cfg.base_size * cfg.base_size * g, "PG.G.Input")
    out = out.reshape(-1, cfg.base_size, cfg.base_size, g)
    if cfg.use_pixel_norm:
        out = pixel_norm(out)

    prev = None
    for s in range(1, stage + 1):
        prev = out
        out = residual_block(ctx, base, out, g, g, 3, f"PG.G.Block.{s}",
                             resample="up", labels=labels)
        # pixel-norm after EVERY block (the PGGAN recipe): the residual
        # sum's variance otherwise grows with depth, so by stage 3 the
        # fresh ToRGB preactivation sits deep in tanh saturation, its
        # gradient vanishes, and the new stage never trains (observed:
        # |tanh| = 1.000 at init, stage-3 block params frozen, generator
        # collapses to a solid color)
        if cfg.use_pixel_norm:
            out = pixel_norm(out)
    out = nonlinearity(out)
    rgb = jnp.tanh(_to_rgb(ctx, cfg, out, stage))
    if trans and prev is not None:
        # same nonlinearity + ToRGB.{stage-1} as the previous stage's own
        # output path: at alpha=0 the transition output IS the upsampled
        # previous-stage image (the PGGAN fade-in contract)
        low = jnp.tanh(_to_rgb(ctx, cfg, nonlinearity(prev), stage - 1))
        rgb = alpha * rgb + (1.0 - alpha) * upsample_depth_to_space(low)
    return rgb


def discriminator(ctx: Ctx, cfg: PGGANConfig, base: ResnetGANConfig, x: jax.Array,
                  stage: int, trans: bool = False, alpha: float = 1.0,
                  labels=None):
    """Progressive critic mirroring the generator's schedule; returns pooled
    features and the scalar logit.

    When ``labels`` is given (conditional mode) the logit gains a
    projection term ``Σ feat · SN-linear(embed(y))`` — the same
    projection-discriminator head the main stack uses
    (``gan_resnet.py:414-421,588``).  The head is stage-independent (the
    pooled feature width is constant across the schedule), so fade-in
    needs no special casing."""
    g = cfg.dim
    out = _from_rgb(ctx, cfg, x, stage, g)
    for s in range(stage, 0, -1):
        out = residual_block(ctx, base, out, g, g, 3, f"PG.D.Block.{s}",
                             resample="down", spectral_normed=True)
        if trans and s == stage:
            low = _from_rgb(ctx, cfg, mean_pool(x), stage - 1, g)
            out = alpha * out + (1.0 - alpha) * low
    out = nonlinearity(out)
    feat = jnp.mean(out, axis=(1, 2))
    logit = linear_lib(ctx, feat, g, 1, "PG.D.Output", spectral_normed=True)
    logit = logit.reshape(-1)
    if labels is not None:
        emb = embed_y(ctx, labels, base.vocab_size, base.embedding_dim,
                      name="PG.D.Embedding.Label")
        emb = linear_lib(ctx, emb, base.embedding_dim, g, "PG.D.Embedding_y",
                         spectral_normed=True, biases=True)
        logit = logit + jnp.sum(feat * emb, axis=1)
    return feat, logit
