"""Weight-initializer zoo matching the reference's exact scaling formulas.

Sources (behavioral parity, re-derived — not copied):
  * DCGAN stack: truncated-normal(0.02) convs (``mnist/ops.py:57-58``),
    normal(0.02) deconv/linear (``mnist/ops.py:74-75,106-108``).
  * ResNet stack: uniform(+-stdev*sqrt(3)) with he/Glorot stdev and the
    conv fan formula ``fan_in = cin*k^2``, ``fan_out = cout*k^2/stride^2``
    (``cifar10/common/ops/conv2d.py:84-106``), and the linear init zoo
    lecun/glorot/he/glorot_he/orthogonal/uniform
    (``cifar10/common/ops/linear.py:60-137``).
Each initializer is ``f(key, shape, dtype) -> array``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype=dtype)

    return init


zeros = constant(0.0)
ones = constant(1.0)


def normal(stddev: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def truncated_normal(stddev: float = 0.02):
    """TF ``truncated_normal_initializer``: resample beyond 2 sigma."""

    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def uniform_stdev(stdev: float):
    """Uniform on ``[-stdev*sqrt(3), stdev*sqrt(3)]`` (the GAN_Lib helper)."""

    def init(key, shape, dtype=jnp.float32):
        lim = stdev * math.sqrt(3.0)
        return jax.random.uniform(key, shape, dtype, minval=-lim, maxval=lim)

    return init


def uniform_range(limit: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)

    return init


def conv_fans(shape: Sequence[int], stride: int = 1):
    """(fan_in, fan_out) for HWIO conv filters with the reference's formula."""
    kh, kw, cin, cout = shape
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw / (stride**2)
    return fan_in, fan_out


def conv_uniform(stride: int = 1, he: bool = True, gain: float = 1.0):
    """he: stdev=sqrt(4/(fan_in+fan_out)); else Glorot sqrt(2/(fan_in+fan_out))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = conv_fans(shape, stride)
        factor = 4.0 if he else 2.0
        stdev = math.sqrt(factor / (fan_in + fan_out))
        return gain * uniform_stdev(stdev)(key, shape, dtype)

    return init


def linear_uniform(initialization=None, gain: float = 1.0):
    """The reference Linear init zoo.  ``initialization`` in
    {None, 'lecun', 'glorot'/'xavier', 'he', 'glorot_he', 'orthogonal',
    ('uniform', range)}.  ``None`` means glorot unless in==out, which the
    reference routes to orthogonal (``linear.py:112-113``)."""

    def init(key, shape, dtype=jnp.float32):
        input_dim, output_dim = shape
        spec = initialization
        if spec is None and input_dim == output_dim:
            spec = "orthogonal"
        if spec is None or spec in ("glorot", "xavier"):
            w = uniform_stdev(math.sqrt(2.0 / (input_dim + output_dim)))(key, shape, dtype)
        elif spec == "lecun":
            w = uniform_stdev(math.sqrt(1.0 / input_dim))(key, shape, dtype)
        elif spec == "he":
            w = uniform_stdev(math.sqrt(2.0 / input_dim))(key, shape, dtype)
        elif spec == "glorot_he":
            w = uniform_stdev(math.sqrt(4.0 / (input_dim + output_dim)))(key, shape, dtype)
        elif spec == "orthogonal":
            w = orthogonal()(key, shape, dtype)
        elif isinstance(spec, (tuple, list)) and spec[0] == "uniform":
            w = uniform_range(float(spec[1]))(key, shape, dtype)
        else:
            raise ValueError(f"Invalid initialization {initialization!r}")
        return gain * w

    return init


def orthogonal(scale: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            raise ValueError("orthogonal init needs >=2D shape")
        flat = (shape[0], int(jnp.prod(jnp.array(shape[1:]))))
        a = jax.random.normal(key, flat, jnp.float32)
        u, _, vt = jnp.linalg.svd(a, full_matrices=False)
        q = u if u.shape == flat else vt
        return (scale * q.reshape(shape)).astype(dtype)

    return init


def glorot_uniform():
    """TF1 ``get_variable`` default — used for ``confusion_logits``
    (``mnist/model.py:102-106``, ``cifar10/gan_resnet.py:500-503``)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[-1]
        lim = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-lim, maxval=lim)

    return init
