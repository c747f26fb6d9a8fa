"""Pallas TPU kernel: fused 3x3 stride-1 SAME conv (NHWC, bf16-in/f32-acc).

The flagship CIFAR ResNet GAN's flop budget is dominated by ONE conv shape
class: 3x3, stride 1, SAME, 128-in/128-out channels over 8^2-32^2 NHWC maps
(every ResidualBlock conv — resampling happens OUTSIDE the conv via
mean-pool / depth-to-space, ``cifar10/gan_resnet.py:231-272``).  Round-4
profiling put the XLA conv envelope at ~55% MXU on this mix
(``docs/perf/scaling_r4.json``); this kernel is the round-5 attempt to beat
it (VERDICT r4 item 3).

Design: grid over batch blocks.  Each cell holds a padded input block
``[ibc, H+2, W+2, C]`` and the whole filter ``[3, 3, C, O]`` in VMEM, and
accumulates the 9 shifted-tap matmuls ``(ibc*H*W, C) @ (C, O)`` into an f32
scratch — H-axis shifts are free (untiled leading dim), W-axis shifts are
sublane rotates, and every tap is an MXU-shaped dot with K=C(=128).  ``ibc``
is sized so the effective matmul M is ~4096 rows for every flagship map
(32^2 -> 4 images/cell, 16^2 -> 16, 8^2 -> 64).

Backward is expressed as the two standard XLA convs (input-grad: conv with
the spatially-flipped, io-transposed filter; weight-grad: the batch-reducing
VALID conv) via ``jax.custom_vjp``, so routing the kernel only swaps the
forward op.

Routing (measured on v5e, ``scripts/bench_conv_kernel.py``): OFF by default —
see the A/B table in docs/perf/; the op layer consults
``runtime.kernel_enabled("conv3x3", default=_MEASURED_DEFAULT)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime

_DIMS = ("NHWC", "HWIO", "NHWC")

# Flip to True only if the A/B measures the kernel faster than XLA's conv
# on the flagship mix (the cond-BN kernel's measure-and-route discipline).
_MEASURED_DEFAULT = False

# VMEM budget for the padded input block (bf16 bytes); the acc scratch is
# f32 at the same row count and the out block bf16 — all double-buffered.
_IN_BLOCK_BUDGET = 2 * 1024 * 1024


def _images_per_cell(b: int, h: int, w: int, c: int, in_bytes: int) -> int | None:
    """Largest divisor of ``b`` whose padded input block fits the budget,
    preferring M = ibc*h*w around 4096 rows."""
    per_img = (h + 2) * (w + 2) * c * in_bytes
    cap = max(1, _IN_BLOCK_BUDGET // per_img)
    want = max(1, 4096 // (h * w))
    cap = min(cap, b)
    target = min(cap, want)
    for k in range(target, 0, -1):
        if b % k == 0:
            return k
    return None


def supported(x_shape, w_shape) -> bool:
    b, h, w, c = x_shape
    kh, kw, wc, o = w_shape
    if (kh, kw) != (3, 3) or wc != c:
        return False
    if c % 128 or o % 128:
        return False
    if h < 2 or w < 2:
        return False
    return _images_per_cell(b, h, w, c, 2) is not None


def _conv3x3_kernel(x_ref, w_ref, o_ref, acc_ref):
    """x_ref [ibc, H+2, W+2, C]; w_ref [9, C, O]; o_ref [ibc, H, W, O];
    acc_ref f32 [ibc*H*W, O]."""
    ibc, hp, wp, c = x_ref.shape
    h, w = hp - 2, wp - 2
    o = o_ref.shape[-1]
    acc = jnp.zeros((ibc * h * w, o), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_ref[:, dy : dy + h, dx : dx + w, :].reshape(ibc * h * w, c)
            acc += jnp.dot(
                tap, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc_ref[:] = acc
    o_ref[:] = acc_ref[:].reshape(ibc, h, w, o).astype(o_ref.dtype)


def _conv3x3_pallas(x, w):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    ibc = _images_per_cell(b, h, wdt, c, x.dtype.itemsize)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, c, o).astype(x.dtype)
    grid = (b // ibc,)
    out = pl.pallas_call(
        _conv3x3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ibc, h + 2, wdt + 2, c), lambda ib: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda ib: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ibc, h, wdt, o), lambda ib: (ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((ibc * h * wdt, o), jnp.float32)],
        interpret=runtime.interpret_mode(),
    )(xp, w9)
    return out


@jax.custom_vjp
def conv3x3_fused(x, w):
    """3x3 stride-1 SAME NHWC conv; ``x [B,H,W,C]``, ``w [3,3,C,O]`` (both
    in the compute dtype).  f32 accumulation, output in ``x.dtype``."""
    return _conv3x3_pallas(x, w)


def _fwd(x, w):
    return _conv3x3_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # input grad: SAME conv of g with the spatially-flipped, io-transposed
    # filter (the standard transpose of a stride-1 cross-correlation)
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, w_t.astype(g.dtype), (1, 1), "SAME", dimension_numbers=_DIMS
    )
    # weight grad: batch-reducing VALID conv — lhs = padded x with channels
    # as the "batch" axis, rhs = g with batch as the contraction axis
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0),  # [C, H+2, W+2, B]
        g.transpose(1, 2, 0, 3),   # [H, W, B, O]
        (1, 1), "VALID", dimension_numbers=_DIMS,
    )  # [C, 3, 3, O]
    return dx.astype(x.dtype), dw.transpose(1, 2, 0, 3).astype(w.dtype)


conv3x3_fused.defvjp(_fwd, _bwd)


def maybe_conv3x3(x, w, stride: int, padding: str) -> jax.Array | None:
    """Routing hook for the op layer: the fused kernel's result when this
    call is in the supported class AND the kernel is routed on, else None."""
    if stride != 1 or padding != "SAME":
        return None
    if not supported(x.shape, w.shape):
        return None
    if not runtime.kernel_enabled("conv3x3", default=_MEASURED_DEFAULT):
        return None
    return conv3x3_fused(x, w)
