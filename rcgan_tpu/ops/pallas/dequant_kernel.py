"""Pallas TPU kernel: fused CIFAR dequantization.

Fuses the reference's real-data preamble (``cifar10/gan_resnet.py:548-551``)
— uint8→[-1,1) scaling, additive U[0, 1/128) dequantization noise, and the
CHW→HWC permutation — into one pass using the on-core PRNG
(``pltpu.prng_random_bits``), removing the host-side RNG tensor and two
intermediate HBM round trips per critic step.

The PRNG is seeded PER ROW from a [B] seed vector so each example's noise
depends only on its own seed — with seeds derived from global batch
indices (``core.rng.example_keys``) the noise is identical under any
data-sharding layout (the DP-equivalence property; see core/rng.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime


def _kernel(seed_ref, x_ref, out_ref):
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    x = x_ref[:].astype(jnp.float32)  # [1, D//128, 128] CHW-flat row
    x = 2.0 * (x / 256.0 - 0.5)
    # prng_random_bits yields signed int32 on TPU; a plain >> would
    # arithmetic-shift the sign bit (noise centered at 0 instead of
    # [0, 1/128)), and uint32→f32 casts are unsupported in Mosaic — use a
    # logical shift on the int32 bits, which lands in [0, 2^24).
    bits = pltpu.prng_random_bits(x.shape)
    u24 = jax.lax.shift_right_logical(bits, 8)
    u = u24.astype(jnp.float32) * (1.0 / (1 << 24) / 128.0)
    out_ref[:] = x + u


def dequantize_chw_flat(x_int: jax.Array, seeds: jax.Array) -> jax.Array:
    """[B, 3072] int (uint8 values) → [B, 3072] float in [-1, 1+1/128),
    still CHW-flat; ``seeds`` is a [B] int32 per-row seed vector (a scalar
    is broadcast to ``seed + arange(B)``).  Use :func:`chw_to_hwc_flat`
    after (XLA fuses the transpose into the consumer)."""
    b, d = x_int.shape
    assert d % 128 == 0, "dequant kernel needs the row dim lane-aligned"
    s = d // 128  # row as a [S, 128] tile: sublane dim S=24 for CIFAR
    seeds = jnp.asarray(seeds, jnp.int32)
    if seeds.ndim == 0:
        seeds = seeds + jnp.arange(b, dtype=jnp.int32)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, s, 128), lambda i, seed_ref: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, s, 128), lambda i, seed_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, 128), jnp.float32),
        interpret=runtime.interpret_mode(),
    )(seeds, x_int.astype(jnp.int32).reshape(b, s, 128))
    return out.reshape(b, d)


def chw_to_hwc_flat(x: jax.Array, img_size: int = 32, img_dim: int = 3) -> jax.Array:
    b = x.shape[0]
    return (
        x.reshape(b, img_dim, img_size, img_size)
        .transpose(0, 2, 3, 1)
        .reshape(b, img_size * img_size * img_dim)
    )


def dequantize_fused(x_int: jax.Array, seeds: jax.Array, img_size: int = 32, img_dim: int = 3):
    """Drop-in for ``data.cifar10.dequantize_chw_to_hwc`` on TPU (PRNG stream
    differs from jax.random — same distribution)."""
    return chw_to_hwc_flat(dequantize_chw_flat(x_int, seeds), img_size, img_dim)
