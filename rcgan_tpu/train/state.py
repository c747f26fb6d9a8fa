"""Train state: everything the reference kept in TF variables — G/D params,
confusion logits, BN moving stats, SN ``u`` vectors, and the three Adam
slots — as one explicit pytree threaded through a jitted step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from rcgan_tpu.core.module import Params, State, merge, split_by_prefix


@jax.tree_util.register_pytree_node_class
class TrainState:
    """Pytree of (grouped params, model state, per-group optimizer states,
    step counter).  ``groups`` is a dict name → flat param dict."""

    def __init__(self, groups: Dict[str, Params], state: State, opt_states: Dict[str, Any], step):
        self.groups = groups
        self.state = state
        self.opt_states = opt_states
        self.step = step

    @property
    def params(self) -> Params:
        return merge(*self.groups.values())

    def tree_flatten(self):
        return (self.groups, self.state, self.opt_states, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "TrainState":
        d = dict(groups=self.groups, state=self.state, opt_states=self.opt_states, step=self.step)
        d.update(kw)
        return TrainState(**d)


def scaleless_adam(
    b1: float, b2: float, eps: float = 1e-8, moment_dtype=None
) -> optax.GradientTransformation:
    """Adam direction without the learning rate — the step multiplies by the
    (possibly decayed) lr, replicating ``LR * decay`` fed to
    ``tf.train.AdamOptimizer`` every iteration (``gan_resnet.py:802-817``).

    ``moment_dtype``: optional low-precision storage dtype (e.g. bfloat16)
    for BOTH Adam moments — halves the optimizer tail's HBM traffic and
    state size.  Arithmetic stays float32 (moments are widened, updated,
    then narrowed for storage).  Off the reference path; A/B'd for perf."""
    if moment_dtype is None:
        return optax.chain(optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-1.0))
    return _scale_by_adam_lowp(b1, b2, eps, jnp.dtype(moment_dtype))


def _scale_by_adam_lowp(b1: float, b2: float, eps: float, dtype) -> optax.GradientTransformation:
    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, grads,
        )
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, grads,
        )
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        updates = jax.tree_util.tree_map(
            lambda m, v: -(m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32
        )
        narrow = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dtype), t)
        return updates, optax.ScaleByAdamState(count=count, mu=narrow(mu32), nu=narrow(nu32))

    return optax.GradientTransformation(init, update)


def apply_updates_with_lr(params: Params, updates: Params, lr) -> Params:
    return jax.tree_util.tree_map(lambda p, u: p + lr * u, params, updates)


def apply_constraints(params: Params, constraints: Dict[str, Dict[str, Any]]) -> Params:
    """Post-update clip constraints (TF ``constraint=`` on ``get_variable``,
    the projection-D max-norm, ``mnist/ops.py:102-111``)."""
    if not constraints:
        return params
    out = {k: dict(v) for k, v in params.items()}
    for layer, vs in constraints.items():
        if layer not in out:
            continue
        for name, (lo, hi) in vs.items():
            if name in out[layer]:
                out[layer][name] = jnp.clip(out[layer][name], lo, hi)
    return out


def init_train_state(
    params: Params,
    state: State,
    predicates: Dict[str, Any],
    optimizers: Dict[str, optax.GradientTransformation],
) -> TrainState:
    groups = split_by_prefix(params, predicates)
    opt_states = {
        g: optimizers[g].init(groups[g]) for g in groups if g in optimizers and groups[g]
    }
    return TrainState(groups=groups, state=state, opt_states=opt_states, step=jnp.zeros((), jnp.int32))
