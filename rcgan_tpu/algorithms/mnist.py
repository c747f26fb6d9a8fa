"""MNIST loss graphs for all six training modes, as pure functions
(reference: ``DCGAN.build_model``, ``mnist/model.py:96-247``).

Modes map onto two axes exactly as in the reference:
  * ``algorithm`` ∈ {biased, unbiased, rcgan, ambient} selects the wiring;
  * flags select variants: ``estimate_confuse`` turns rcgan into RCGAN-U
    (learned C + expected fake loss), ``perm_regularizer`` adds the
    permutation classifier, ``concat_y``+``add_noise`` turn rcgan into
    RCGAN+y (the annealed re-noising lives in the data layer).

The all-label D evaluations (unbiased real side, RCGAN-U fake side) replace
the reference's Python loop over 10 graph replicas with a factorized or
batched pass (see ``models.dcgan.discriminator_all_labels``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rcgan_tpu.core import initializers as inits
from rcgan_tpu.core.module import Ctx
from rcgan_tpu.algorithms.losses import d_fake_loss, d_real_loss, g_loss, sigmoid_ce
from rcgan_tpu.models.dcgan import (
    DCGANConfig,
    classifier,
    discriminator,
    discriminator_all_labels,
    generator,
)


@dataclasses.dataclass(frozen=True)
class MnistAlgoConfig:
    algorithm: str = "biased"  # biased | unbiased | rcgan | ambient
    estimate_confuse: bool = False
    perm_regularizer: bool = False
    loss_fn: str = "hinge"  # hinge | ce
    perm_multiplier: float = 10.0
    confuse_multiplier: float = 10.0
    # Diagonal-dominant C-logits init, ported from the CIFAR stack
    # (``gan_resnet.py:504-520``) for the RCGAN-U stabilization study —
    # the reference's MNIST stack always uses the default initializer.
    confuse_init: bool = False
    confuse_init_diag: float = 0.2
    y_dim: int = 10


def confusion_matrix(ctx: Ctx, acfg: MnistAlgoConfig, confusion_actual: Optional[jax.Array]):
    """Learned ``softmax(confusion_logits)`` when ``estimate_confuse``
    (``mnist/model.py:102-106``), else the true C as a constant."""
    if acfg.estimate_confuse:
        if acfg.confuse_init:
            from rcgan_tpu.algorithms.cifar import confusion_init_values

            vals = jnp.asarray(confusion_init_values(acfg))
            init_fn = lambda key, shape, dtype: vals.astype(dtype)
        else:
            init_fn = inits.glorot_uniform()
        logits = ctx.param(
            "confusion_logits", "logits", (acfg.y_dim, acfg.y_dim), init_fn
        )
        return jax.nn.softmax(logits, axis=-1)
    assert confusion_actual is not None
    return confusion_actual


def mnist_losses(
    ctx: Ctx,
    cfg: DCGANConfig,
    acfg: MnistAlgoConfig,
    batch: dict,
    z: jax.Array,
    confusion_actual: Optional[jax.Array] = None,
    g_step_only: bool = False,
):
    """Build every loss of ``mnist/model.py:149-224`` in one trace.

    ``batch``: images [B,H,W,1] float, int labels y_real / y_gen / y_fake,
    float y_real_weights [B,10].  Returns a dict of scalars plus the
    diagnostic D probabilities.

    ``g_step_only``: skip the real-data passes entirely — the reference's
    ``g_optim``/``c_optim`` session runs never feed ``inputs``, so the
    real-side D/classifier subgraphs (and their BN/SN state updates) do not
    execute during G steps (``mnist/model.py:359-371``).  Saves one full D
    forward per G step and matches the reference's state dynamics.
    """
    alg = acfg.algorithm
    lt = acfg.loss_fn
    y = acfg.y_dim
    inputs = batch["images"]
    y_real_oh = jax.nn.one_hot(batch["y_real"], y, dtype=inputs.dtype)
    y_gen_oh = jax.nn.one_hot(batch["y_gen"], y, dtype=inputs.dtype)
    y_fake_oh = jax.nn.one_hot(batch["y_fake"], y, dtype=inputs.dtype)
    y_real_w = batch["y_real_weights"]

    cmat = confusion_matrix(ctx, acfg, confusion_actual)
    fake = generator(ctx, cfg, z, y_gen_oh, train=True)

    # ----- real-data discriminator term (mnist/model.py:150-174)
    if g_step_only:
        zero = jnp.zeros(())
        d_prob = jnp.zeros((inputs.shape[0],))
        d_logits = d_prob
        d_loss_real = zero
    elif alg in ("biased", "rcgan", "ambient"):
        d_prob, d_logits = discriminator(ctx, cfg, inputs, y_real_oh)
        d_prob, d_logits = d_prob[:, 0], d_logits[:, 0]
        d_loss_real = jnp.mean(d_real_loss(d_logits, lt))
    elif alg == "unbiased":
        logits_all = discriminator_all_labels(ctx, cfg, inputs)  # [B, y]
        d_prob = jnp.sum(jax.nn.sigmoid(logits_all) * y_real_w, axis=1)
        d_logits = jnp.sum(logits_all * y_real_w, axis=1)
        d_loss_real = jnp.mean(jnp.sum(d_real_loss(logits_all, lt) * y_real_w, axis=1))
    else:
        raise ValueError(f"unknown algorithm {alg!r}")

    # ----- fake-data terms (mnist/model.py:176-212)
    d_loss_fake = None
    gen_loss = None
    if alg in ("rcgan", "ambient"):
        if not acfg.estimate_confuse:
            d_prob_, d_logits_ = discriminator(ctx, cfg, fake, y_fake_oh)
            d_prob_, d_logits_ = d_prob_[:, 0], d_logits_[:, 0]
        else:  # RCGAN-U: expected loss over learned C row of y_gen
            logits_all_ = discriminator_all_labels(ctx, cfg, fake)  # [B, y]
            w = y_gen_oh @ cmat  # C[y_gen]
            d_prob_ = jnp.sum(jax.nn.sigmoid(logits_all_) * w, axis=1)
            d_logits_ = jnp.sum(logits_all_ * w, axis=1)
            d_loss_fake = jnp.mean(jnp.sum(d_fake_loss(logits_all_, lt) * w, axis=1))
            gen_loss = jnp.mean(jnp.sum(g_loss(logits_all_, lt) * w, axis=1))
    elif alg in ("biased", "unbiased"):
        d_prob_, d_logits_ = discriminator(ctx, cfg, fake, y_gen_oh)
        d_prob_, d_logits_ = d_prob_[:, 0], d_logits_[:, 0]

    if d_loss_fake is None:
        d_loss_fake = jnp.mean(d_fake_loss(d_logits_, lt))
    if gen_loss is None:
        gen_loss = jnp.mean(g_loss(d_logits_, lt))

    # ----- permutation-regularizer classifier (mnist/model.py:214-224)
    if acfg.perm_regularizer:
        if g_step_only:
            class_loss_real = jnp.zeros(())
        else:
            cls_real = classifier(ctx, cfg, inputs)
            class_loss_real = jnp.mean(sigmoid_ce(cls_real, y_real_oh))
        cls_fake = classifier(ctx, cfg, fake)
        class_loss_fake = jnp.mean(sigmoid_ce(cls_fake, y_gen_oh))
    else:
        class_loss_real = jnp.zeros(())
        class_loss_fake = jnp.zeros(())

    return {
        "d_loss_real": d_loss_real,
        "d_loss_fake": d_loss_fake,
        "d_loss": d_loss_real + d_loss_fake,
        "g_loss": gen_loss,
        "class_loss_real": class_loss_real,
        "class_loss_fake": class_loss_fake,
        "D": d_prob,
        "D_": d_prob_,
        "confusion": cmat,
        "G": fake,
    }


def partition_predicates():
    """Name-prefix optimizer partition reproducing ``mnist/model.py:244-245``:
    ``'d_' in name`` → disc (includes the perm classifier), ``'g_'`` → gen,
    ``confusion_logits`` its own group."""
    return {
        "confusion": lambda n: n == "confusion_logits",
        "disc": lambda n: "d_" in n,
        "gen": lambda n: "g_" in n,
    }
