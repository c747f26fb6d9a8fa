"""Pallas TPU kernels: fused conditional batch-norm forward (tiled two-pass).

Replaces the reference's moments + embedding_lookup + batch_normalization
sequence (``cifar10/common/ops/normalization.py:27-59``) — the hottest
normalization in the CIFAR generator (it runs 7x per G forward) — with two
VMEM-tiled passes:

1. **moments**: per-channel sum and sum-of-squares accumulated over
   (batch, spatial) grid tiles (sequential TPU grid → safe accumulation).
   Variance is then ``E[x^2] - mean^2`` in f32 — a ONE-pass statistical
   scheme ("two-pass" above refers to the two kernel launches, not
   Welford).  Over the <=128k-element flagship reductions this cancels
   catastrophically only when ``|mean| >> std``; generator pre-BN
   activations are near zero-mean, and the oracle tests bound the error
   at flagship shapes.  A centered second pass would double the read
   traffic of exactly the pass this kernel exists to fuse away;
2. **apply**: ``(x - mean) * rsqrt(var + eps) * scale_e + offset_e`` with
   the per-example affine, written tile by tile.

Tiling over batch AND spatial means the kernel covers every generator map
of the flagship config — including the 16^2/32^2 maps at gen-batch 128
that the earlier single-block kernel had to route to the XLA fallback.

The backward pass is the standard BN VJP plus label-scattered table grads,
expressed in jnp (XLA fuses it into the surrounding backward) via
``jax.custom_vjp`` so the kernel is fully trainable.

Shapes: ``x [B, S, C]`` (spatial flattened), per-example ``scale/offset
[B, C]`` (already gathered by label — gathers are cheap; the win is fusing
the reduction+normalize passes).  C rides the lane axis, S the sublane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime

# Per-block VMEM budget (bytes of f32) for the x tile.  Actual scoped VMEM
# is ~3x this: the f32 out block + bf16 in block, each DOUBLE-BUFFERED
# across grid steps; 2 MB keeps the apply kernel under the 16 MB scoped
# limit (4 MB OOM'd at [128, 64x64, 128] on v5e).
_VMEM_BLOCK_BUDGET = 2 * 1024 * 1024

# Below this array size the XLA path wins: XLA promotes small pallas-call
# operands/results wholesale into VMEM, which collides with the kernel's
# scoped stack (observed OOM at a 2 MB [16, 1024, 32] map on v5e), and its
# own fused BN on a VMEM-resident tensor has no HBM round trip to save
# anyway.  6 MB keeps every >=16^2 flagship map fused (VERDICT r1 item 5a:
# 16^2 at batch 64 is 8 MB) while tiny maps take the XLA path.
_MIN_FUSED_BYTES = 6 * 1024 * 1024


def _tiles(b: int, s: int, c: int):
    """(Bt, St, Ct) grid tiles for [B, S, C], or None → use the XLA path.
    Lane dim Ct must be a multiple of 128 (or the whole of C); sublane St a
    multiple of 8 (or the whole of S); Bt is the leading dim, sized to the
    VMEM budget and rounded down to a divisor of B."""
    if c % 128 == 0:
        ct = 128
    elif c <= 128:
        ct = c
    else:
        return None
    st = min(s, 512)
    while st > 1 and s % st:
        st //= 2
    if s % st or (st % 8 and st != s):
        return None
    cap = min(max(1, _VMEM_BLOCK_BUDGET // (st * ct * 4)), b)
    # bt is also the SUBLANE dim of the [Bt, Ct] affine blocks: it must
    # divide B and be a multiple of 8, or be the whole of B (Mosaic rejects
    # anything else — observed at B=100, the 10x10 sampler batch).
    bt = next((k for k in range(cap, 0, -1) if b % k == 0 and k % 8 == 0), None)
    if bt is None:
        if b * st * ct * 4 <= _VMEM_BLOCK_BUDGET:
            bt = b  # whole-batch block still fits the budget
        else:
            return None  # e.g. B=500 eval batches: XLA path
    return bt, st, ct


def should_fuse(b: int, s: int, c: int) -> bool:
    """Routing decision for the op layer: big enough to save HBM round
    trips AND tileable."""
    return b * s * c * 4 >= _MIN_FUSED_BYTES and _tiles(b, s, c) is not None


def _moments_kernel(x_ref, sum_ref, sq_ref):
    x = x_ref[:].astype(jnp.float32)  # [Bt, St, Ct]

    @pl.when(jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0))
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    sum_ref[:] += jnp.sum(x, axis=(0, 1))[None]
    sq_ref[:] += jnp.sum(x * x, axis=(0, 1))[None]


def _apply_kernel(mean_ref, inv_ref, scale_ref, offset_ref, x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # [Bt, St, Ct]
    xhat = (x - mean_ref[:][None]) * inv_ref[:][None]
    out = xhat * scale_ref[:][:, None, :] + offset_ref[:][:, None, :]
    # write in the activation dtype (bf16 in the flagship): halves the
    # kernel's HBM write traffic vs an f32 out + downstream cast
    out_ref[:] = out.astype(out_ref.dtype)


def _cond_bn_fwd_pallas(x, scale_e, offset_e, eps):
    b, s, c = x.shape
    bt, st, ct = _tiles(b, s, c)
    grid = (c // ct, b // bt, s // st)  # c-tile OUTER: accumulators per c-tile
    interpret = runtime.interpret_mode()

    x_spec = pl.BlockSpec((bt, st, ct), lambda ic, ib, is_: (ib, is_, ic),
                          memory_space=pltpu.VMEM)
    csum, csq = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[x_spec],
        out_specs=[
            pl.BlockSpec((1, ct), lambda ic, ib, is_: (0, ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda ic, ib, is_: (0, ic), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)

    n = b * s
    mean = csum / n  # [1, C]
    var = jnp.maximum(csq / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)

    out = pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ct), lambda ic, ib, is_: (0, ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda ic, ib, is_: (0, ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ct), lambda ic, ib, is_: (ib, ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ct), lambda ic, ib, is_: (ib, ic), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=pl.BlockSpec((bt, st, ct), lambda ic, ib, is_: (ib, is_, ic),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        interpret=interpret,
    )(mean, inv, scale_e.astype(jnp.float32), offset_e.astype(jnp.float32), x)
    return out, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cond_batchnorm_fused(x, scale_e, offset_e, eps=1e-5):
    """``x [B,S,C]`` float; ``scale_e/offset_e [B,C]`` per-example affine.
    Returns normalized output in ``x.dtype`` (moments in float32)."""
    out, _, _ = _cond_bn_fwd_pallas(x, scale_e, offset_e, eps)
    return out


def _fwd(x, scale_e, offset_e, eps):
    out, mean, var = _cond_bn_fwd_pallas(x, scale_e, offset_e, eps)
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


def cond_batchnorm_bhwc(x, labels, scale_table, offset_table, eps=1e-5):
    """BHWC convenience wrapper: gather per-example affine, run the fused
    two-pass kernel (any flagship shape), restore shape.  Drop-in for
    ``ops.norm.cond_batchnorm``'s math; falls back to XLA-fused jnp only
    when the shape cannot be lane/sublane tiled."""
    bsz, h, w, c = x.shape
    scale_e = jnp.take(scale_table, labels, axis=0)
    offset_e = jnp.take(offset_table, labels, axis=0)
    if not should_fuse(bsz, h * w, c):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2), keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + eps)
        out = out * scale_e[:, None, None, :] + offset_e[:, None, None, :]
        return out.astype(x.dtype)
    out = cond_batchnorm_fused(x.reshape(bsz, h * w, c), scale_e, offset_e, eps)
    return out.reshape(bsz, h, w, c).astype(x.dtype)
