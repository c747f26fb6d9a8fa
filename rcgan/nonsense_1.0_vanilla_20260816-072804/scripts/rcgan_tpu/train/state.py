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


def scaleless_adam(b1: float, b2: float, eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam direction without the learning rate — the step multiplies by the
    (possibly decayed) lr, replicating ``LR * decay`` fed to
    ``tf.train.AdamOptimizer`` every iteration (``gan_resnet.py:802-817``)."""
    return optax.chain(optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-1.0))


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
