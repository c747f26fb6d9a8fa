"""Pallas TPU kernel: fused conditional batch-norm forward.

Replaces the reference's moments + embedding_lookup + batch_normalization
sequence (``cifar10/common/ops/normalization.py:27-59``) — the hottest
normalization in the CIFAR generator (it runs 7x per G forward) — with a
single VMEM-resident pass: per-channel moments over (batch, spatial) and the
per-example affine applied in one read of ``x``.

The backward pass is the standard BN VJP plus label-scattered table grads,
expressed in jnp (XLA fuses it into the surrounding backward) via
``jax.custom_vjp`` so the kernel is fully trainable.

Shapes: ``x [B, S, C]`` (spatial flattened), per-example ``scale/offset
[B, C]`` (already gathered by label — gathers are cheap; the win is fusing
the two reduction+normalize passes).  C is tiled on the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime


def _fwd_kernel(x_ref, scale_ref, offset_ref, out_ref, mean_ref, var_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # [B, S, Ct]
    b, s, c = x.shape
    n = b * s
    mean = jnp.sum(x, axis=(0, 1), keepdims=True) / n  # [1, 1, Ct]
    var = jnp.sum(jnp.square(x - mean), axis=(0, 1), keepdims=True) / n
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    out_ref[:] = xhat * scale_ref[:][:, None, :] + offset_ref[:][:, None, :]
    mean_ref[:] = mean[0]
    var_ref[:] = var[0]


def _cond_bn_fwd_pallas(x, scale_e, offset_e, eps):
    b, s, c = x.shape
    tile_c = min(c, 256)
    assert c % tile_c == 0
    grid = (c // tile_c,)
    out, mean, var = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, s, tile_c), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, s, tile_c), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=runtime.interpret_mode(),
    )(x, scale_e, offset_e)
    return out, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cond_batchnorm_fused(x, scale_e, offset_e, eps=1e-5):
    """``x [B,S,C]`` float; ``scale_e/offset_e [B,C]`` per-example affine.
    Returns normalized output in float32."""
    out, _, _ = _cond_bn_fwd_pallas(x.astype(jnp.float32), scale_e, offset_e, eps)
    return out


def _fwd(x, scale_e, offset_e, eps):
    out, mean, var = _cond_bn_fwd_pallas(x.astype(jnp.float32), scale_e, offset_e, eps)
    return out, (x, scale_e, mean, var)


def _bwd(eps, res, g):
    x, scale_e, mean, var = res
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)  # [1, C]
    xhat = (x32 - mean[:, None, :]) * inv[:, None, :]
    g = g.astype(jnp.float32)

    dscale = jnp.sum(g * xhat, axis=1)  # [B, C]
    doffset = jnp.sum(g, axis=1)  # [B, C]

    dxhat = g * scale_e[:, None, :]
    m1 = jnp.mean(dxhat, axis=(0, 1), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(0, 1), keepdims=True)
    dx = inv[:, None, :] * (dxhat - m1 - xhat * m2)
    # cotangents must match the primal dtypes (bf16 activations etc.)
    return (
        dx.astype(x.dtype),
        dscale.astype(scale_e.dtype),
        doffset.astype(scale_e.dtype),
    )


cond_batchnorm_fused.defvjp(_fwd, _bwd)


# The kernel holds a [B, S, tile_c] block in VMEM per grid step; past this
# budget (f32 bytes) we fall back to the XLA-fused jnp math — same numerics.
_VMEM_BLOCK_BUDGET = 6 * 1024 * 1024


def cond_batchnorm_bhwc(x, labels, scale_table, offset_table, eps=1e-5):
    """BHWC convenience wrapper: gather per-example affine, run the fused
    kernel (when the block fits VMEM), restore shape.  Drop-in for
    ``ops.norm.cond_batchnorm``'s math."""
    bsz, h, w, c = x.shape
    scale_e = jnp.take(scale_table, labels, axis=0)
    offset_e = jnp.take(offset_table, labels, axis=0)
    tile_c = min(c, 256)
    if bsz * h * w * tile_c * 4 > _VMEM_BLOCK_BUDGET or c % tile_c:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2), keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + eps)
        out = out * scale_e[:, None, None, :] + offset_e[:, None, None, :]
        return out.astype(x.dtype)
    out = cond_batchnorm_fused(x.reshape(bsz, h * w, c), scale_e, offset_e, eps)
    return out.reshape(bsz, h, w, c).astype(x.dtype)
