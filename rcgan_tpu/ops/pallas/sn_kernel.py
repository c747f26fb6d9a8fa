"""Pallas TPU kernel: fused spectral-norm power iteration + weight scaling.

One kernel launch performs the whole spectral-norm call of the reference
(``mnist/sn.py:44-62`` == ``cifar10/common/ops/sn.py``): flatten to
``[m, cout]``, one power-iteration step from the persistent ``u``,
``sigma = v W u'^T``, and the ``W / sigma`` rescale — with ``W`` read into
VMEM once and no HBM intermediates (every flagship weight fits a single
VMEM block; larger weights fall back to the XLA-fused jnp path in
``ops.sn``).

Gradient semantics: the backward pass re-runs the *same math* in jnp under
``jax.vjp``, so gradients flow through the power iteration exactly as in
the reference (TF differentiates through the ``tf.while_loop``; see
``ops/sn.py``) — NOT the Miyato stop-gradient convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcgan_tpu.ops.pallas import runtime

_EPS = 1e-12
# whole-W single-block budget (f32 bytes); flagship max is ~1 MB.  W sits
# in VMEM twice (in + wbar out), so stay well under the 16 MB scoped limit.
_VMEM_W_BUDGET = 4 * 1024 * 1024


def sn_math(w_mat: jax.Array, u0: jax.Array):
    """Reference power-iteration math in jnp (also the VJP recompute path).
    Returns (w_bar, u_new, sigma); all float32."""
    w_mat = w_mat.astype(jnp.float32)
    u0 = u0.astype(jnp.float32)
    v = u0 @ w_mat.T
    v = v / (jnp.sum(v * v) ** 0.5 + _EPS)
    u = v @ w_mat
    u = u / (jnp.sum(u * u) ** 0.5 + _EPS)
    sigma = (v @ w_mat @ u.T)[0, 0]
    return w_mat / sigma, u, sigma


def _kernel(u_ref, w_ref, wbar_ref, unew_ref, sigma_ref):
    w = w_ref[:].astype(jnp.float32)  # [m, cout]
    u0 = u_ref[:].astype(jnp.float32)  # [1, cout]
    v = jax.lax.dot_general(u0, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [1, m]
    # jnp.sqrt, NOT ** 0.5: math.powf has no Mosaic lowering
    v = v / (jnp.sqrt(jnp.sum(v * v)) + _EPS)
    u = jnp.dot(v, w, preferred_element_type=jnp.float32)  # [1, cout]
    u = u / (jnp.sqrt(jnp.sum(u * u)) + _EPS)
    wu = jax.lax.dot_general(w, u, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [m, 1]
    sigma = jnp.sum(v * wu.T)
    wbar_ref[:] = w / sigma
    unew_ref[:] = u
    sigma_ref[:] = sigma.reshape(1, 1)


def fits_fused(m: int, cout: int) -> bool:
    return m * cout * 4 <= _VMEM_W_BUDGET


@jax.custom_vjp
def sn_fused(w_mat: jax.Array, u0: jax.Array):
    """Fused spectral norm: ``(w_mat [m, cout], u0 [1, cout]) →
    (w_bar, u_new, sigma)``, float32."""
    m, cout = w_mat.shape
    wbar, unew, sigma = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=runtime.interpret_mode(),
    )(u0.astype(jnp.float32), w_mat.astype(jnp.float32))
    return wbar, unew, sigma[0, 0]


def _fwd(w_mat, u0):
    out = sn_fused(w_mat, u0)
    return out, (w_mat, u0)


def _bwd(res, cts):
    w_mat, u0 = res
    # Re-derive the gradient from the identical jnp math: grads flow through
    # the power iteration (reference semantics); u0 is persistent state and
    # receives no cotangent (the trainer never differentiates state).
    _, vjp = jax.vjp(functools.partial(sn_math, u0=u0), w_mat.astype(jnp.float32))
    (dw,) = vjp(tuple(cts))
    return dw.astype(w_mat.dtype), jnp.zeros_like(u0)


sn_fused.defvjp(_fwd, _bwd)
