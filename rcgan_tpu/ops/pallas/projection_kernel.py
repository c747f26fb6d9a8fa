"""Pallas TPU kernel: fused projection-discriminator logits.

The projection head forms ``logit = wgan + Σ_c feat·emb`` at every D call
(``cifar10/gan_resnet.py:588``) and, for the noisy-label expected losses,
the all-label variant ``logits[b, l] = wgan[b] + feat[b] · emb[l]``
(``gan_resnet.py:654-660``) — a skinny matmul + broadcast add.  Fusing the
add into the MXU epilogue keeps the [B, V] block in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime


def _kernel(feat_ref, emb_ref, wgan_ref, out_ref):
    logits = jnp.dot(
        feat_ref[:], emb_ref[:].T, preferred_element_type=jnp.float32
    )  # [B, V]
    out_ref[:] = logits + wgan_ref[:]


@jax.custom_vjp
def all_label_projection_logits(feat, emb, wgan):
    """``feat [B, D]``, ``emb [V, D]``, ``wgan [B, 1]`` → ``[B, V]``."""
    b, d = feat.shape
    v = emb.shape[0]
    return pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, v), jnp.float32),
        interpret=runtime.interpret_mode(),
    )(feat.astype(jnp.float32), emb.astype(jnp.float32), wgan.astype(jnp.float32))


def _fwd(feat, emb, wgan):
    # wgan ([B, 1], tiny) rides in residuals only to carry its dtype — a
    # bare np.dtype is not a valid JAX residual type
    return all_label_projection_logits(feat, emb, wgan), (feat, emb, wgan)


def _bwd(res, g):
    feat, emb, wgan = res
    wgan_dtype = wgan.dtype
    g = g.astype(jnp.float32)
    dfeat = g @ emb.astype(jnp.float32)
    demb = g.T @ feat.astype(jnp.float32)
    # every cotangent must carry its primal's dtype: an f32 dwgan against a
    # bf16 wgan trips JAX's aval consistency assert once the caller slices
    # the logits (the unbiased all-label real pass under bf16 compute)
    dwgan = jnp.sum(g, axis=1, keepdims=True).astype(wgan_dtype)
    return dfeat.astype(feat.dtype), demb.astype(emb.dtype), dwgan


all_label_projection_logits.defvjp(_fwd, _bwd)
