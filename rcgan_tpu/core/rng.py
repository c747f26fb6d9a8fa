"""Layout-invariant per-example RNG keys.

The reference's 1-GPU run duplicates its device list so the "2-device"
graph runs on one GPU (``cifar10/gan_resnet.py:187-188``) — an implicit
assertion that sharded and unsharded training coincide.  To make that
property hold tightly under SPMD, every per-example random draw is keyed
by the example's GLOBAL batch index rather than by the shard: the same
example receives the same noise under any mesh layout, so an N-way
sharded step matches the single-device step to float tolerance (the only
residual difference is reduction ordering).

Sharding convention: batches are sharded contiguously on the leading axis
(``PartitionSpec('data')``), so shard ``s`` of a global batch of
``n_shards * local_n`` holds rows ``[s*local_n, (s+1)*local_n)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_indices(local_n: int, axis=None) -> jax.Array:
    """[local_n] global example indices for this shard (0-based)."""
    start = 0 if axis is None else jax.lax.axis_index(axis) * local_n
    return start + jnp.arange(local_n, dtype=jnp.int32)


def example_keys(rng: jax.Array, local_n: int, axis=None) -> jax.Array:
    """[local_n] PRNG keys, one per example, keyed by global index."""
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(global_indices(local_n, axis))


def example_normal(rng: jax.Array, local_n: int, dim: int, axis=None) -> jax.Array:
    """[local_n, dim] standard normals, layout-invariant per example."""
    keys = example_keys(rng, local_n, axis)
    return jax.vmap(lambda k: jax.random.normal(k, (dim,), jnp.float32))(keys)


def example_uniform(
    rng: jax.Array, local_n: int, dim: int, axis=None, minval=0.0, maxval=1.0
) -> jax.Array:
    """[local_n, dim] uniforms in [minval, maxval), layout-invariant."""
    keys = example_keys(rng, local_n, axis)
    return jax.vmap(
        lambda k: jax.random.uniform(k, (dim,), jnp.float32, minval, maxval)
    )(keys)
