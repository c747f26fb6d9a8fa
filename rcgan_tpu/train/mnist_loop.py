"""MNIST fused train step: 1 D update + 2x (G update + C update) compiled as
ONE XLA program (reference hot loop ``mnist/model.py:335-467``, which issued
3 optimizer ``sess.run``s + 5 diagnostic evals per batch over feed_dict).

Diagnostics (errD/errG/D probabilities) are byproducts of the same forward
passes instead of the reference's 5 extra ``sess.run``s — same quantities,
evaluated pre-update rather than re-evaluated post-update.
"""

from __future__ import annotations

import dataclasses
import functools


import numpy as np

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx, merge
from rcgan_tpu.core.rng import example_uniform
from rcgan_tpu.algorithms.mnist import MnistAlgoConfig, mnist_losses, partition_predicates
from rcgan_tpu.models.dcgan import DCGANConfig, generator
from rcgan_tpu.train.state import (
    TrainState,
    apply_constraints,
    apply_updates_with_lr,
    init_train_state,
    scaleless_adam,
)


@dataclasses.dataclass(frozen=True)
class MnistTrainConfig:
    learning_rate: float = 2e-4
    beta1: float = 0.5
    confuse_multiplier: float = 10.0
    perm_multiplier: float = 10.0
    g_steps: int = 2  # mnist/model.py:359-372: 1 D step then 2 G steps


def _loss_ctx(params, state, rng, compute_dtype):
    return Ctx(params=params, state=state, rng=rng, init=False, train=True,
               update_sn=True, compute_dtype=compute_dtype)


class MnistTrainer:
    """Owns configs, constraints, optimizers and the jitted step."""

    def __init__(
        self,
        cfg: DCGANConfig,
        acfg: MnistAlgoConfig,
        tcfg: MnistTrainConfig,
        confusion_actual: np.ndarray,
        mesh=None,
        compute_dtype=jnp.float32,
    ):
        self.cfg, self.acfg, self.tcfg = cfg, acfg, tcfg
        self.confusion_actual = jnp.asarray(confusion_actual, jnp.float32)
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.optimizers = {
            "disc": scaleless_adam(tcfg.beta1, 0.999),
            "gen": scaleless_adam(tcfg.beta1, 0.999),
            "confusion": scaleless_adam(tcfg.beta1, 0.999),
        }
        self.constraints = {}

    # ------------------------------------------------------------- build
    def init(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        ctx = Ctx(rng=rng, init=True, compute_dtype=self.compute_dtype)
        z = jnp.zeros((sample_batch["images"].shape[0], self.cfg.z_dim), jnp.float32)
        mnist_losses(ctx, self.cfg, self.acfg, sample_batch, z, self.confusion_actual)
        self.constraints = ctx.constraints
        preds = partition_predicates()
        if not self.acfg.estimate_confuse:
            preds = {k: v for k, v in preds.items() if k != "confusion"}
        return init_train_state(ctx.params, ctx.updated_state(), preds, self.optimizers)

    # -------------------------------------------------------------- step
    def _step(self, ts: TrainState, batch: dict, rng: jax.Array, axis=None) -> tuple:
        """One reference iteration: D update, then g_steps x (G+C update),
        all with the same z (``mnist/model.py:342-372``).  ``axis`` names the
        shard_map data axis when running data-parallel."""
        cfg, acfg, tcfg = self.cfg, self.acfg, self.tcfg
        lr = tcfg.learning_rate

        def pavg(tree):
            if axis is None:
                return tree
            return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), tree)

        # z keyed by GLOBAL example index (core/rng.py): sharded == unsharded
        z = example_uniform(
            jax.random.fold_in(rng, 0), batch["images"].shape[0], cfg.z_dim, axis, -1.0, 1.0
        )

        groups = dict(ts.groups)
        state = ts.state
        opt_states = dict(ts.opt_states)

        # ---- D update: minimize d_loss + 1*class_loss_real over d_ vars
        def d_loss_fn(d_params, state):
            params = merge(*[g for n, g in groups.items() if n != "disc"], d_params)
            ctx = _loss_ctx(params, state, None, self.compute_dtype)
            out = mnist_losses(ctx, cfg, acfg, batch, z, self.confusion_actual)
            return out["d_loss"] + 1.0 * out["class_loss_real"], (out, ctx.updated_state())

        (d_total, (d_out, state)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            groups["disc"], state
        )
        d_grads = pavg(d_grads)
        state = pavg(state)
        d_upd, opt_states["disc"] = self.optimizers["disc"].update(
            d_grads, opt_states["disc"], groups["disc"]
        )
        groups["disc"] = apply_constraints(
            apply_updates_with_lr(groups["disc"], d_upd, lr), self.constraints
        )

        # ---- G (+C) updates: g_loss + perm_mult*class_loss_fake over g_ vars;
        #      confusion logits minimize plain g_loss at lr*confuse_multiplier.
        g_out = None
        for _ in range(tcfg.g_steps):
            has_c = "confusion" in groups

            def g_loss_fn(g_params, c_params, state):
                parts = [g for n, g in groups.items() if n not in ("gen", "confusion")]
                params = merge(*parts, g_params, c_params)
                ctx = _loss_ctx(params, state, None, self.compute_dtype)
                # g_step_only: the reference's g_optim run never executes the
                # real-side subgraphs (mnist/model.py:359-371)
                out = mnist_losses(ctx, cfg, acfg, batch, z, self.confusion_actual,
                                   g_step_only=True)
                total = out["g_loss"] + tcfg.perm_multiplier * out["class_loss_fake"]
                return total, (out, ctx.updated_state())

            c_group = groups.get("confusion", {})
            (_, (g_out, state)), (g_grads, c_grads) = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1), has_aux=True
            )(groups["gen"], c_group, state)
            g_grads, c_grads = pavg((g_grads, c_grads))
            state = pavg(state)
            g_upd, opt_states["gen"] = self.optimizers["gen"].update(
                g_grads, opt_states["gen"], groups["gen"]
            )
            groups["gen"] = apply_updates_with_lr(groups["gen"], g_upd, lr)
            if has_c:
                # note: grad of (g_loss + perm*class_fake) wrt confusion logits
                # equals grad of g_loss — class_loss_fake does not touch C.
                c_upd, opt_states["confusion"] = self.optimizers["confusion"].update(
                    c_grads, opt_states["confusion"], c_group
                )
                groups["confusion"] = apply_updates_with_lr(
                    c_group, c_upd, lr * tcfg.confuse_multiplier
                )

        metrics = {
            "d_loss": d_out["d_loss"],
            "d_loss_real": d_out["d_loss_real"],
            "d_loss_fake": d_out["d_loss_fake"],
            "g_loss": g_out["g_loss"],
            "class_loss_real": d_out["class_loss_real"],
            "class_loss_fake": g_out["class_loss_fake"],
            "prob_real": d_out["D"],
            "prob_fake": g_out["D_"],
            "confusion": g_out["confusion"],
        }
        if axis is not None:
            scalars = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()
                       if k not in ("prob_real", "prob_fake")}
            metrics.update(scalars)
        new_ts = TrainState(groups=groups, state=state, opt_states=opt_states, step=ts.step + 1)
        return new_ts, metrics

    @functools.cached_property
    def _jitted_step(self):
        if self.mesh is None:
            return jax.jit(
                lambda ts, batch, rng: self._step(ts, batch, rng, None), donate_argnums=0
            )
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def sharded(ts, batch, rng):
            return self._step(ts, batch, rng, axis="data")

        repl, data = P(), P("data")
        metric_specs = {
            "d_loss": repl, "d_loss_real": repl, "d_loss_fake": repl, "g_loss": repl,
            "class_loss_real": repl, "class_loss_fake": repl,
            "prob_real": data, "prob_fake": data, "confusion": repl,
        }
        mapped = shard_map(
            sharded,
            mesh=self.mesh,
            in_specs=(repl, data, repl),
            out_specs=(repl, metric_specs),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=0)

    def step(self, ts: TrainState, batch: dict, rng: jax.Array) -> tuple:
        return self._jitted_step(ts, batch, rng)

    # ----------------------------------------------- fused multi-batch scan
    @functools.cached_property
    def _jitted_scan(self):
        """K iterations as ONE ``lax.scan``ed XLA program over a
        device-resident dataset: the epoch loop's per-iteration Python
        dispatch and host->device batch copies disappear (ROADMAP item 5;
        the dataset rides as a runtime argument — see cifar_loop for why
        it must not be a traced constant).  Single-device path (the MNIST
        reference stack is single-device; the mesh path uses :meth:`step`)."""

        def run(ts, dataset_and_key, idx):
            dataset = dict(dataset_and_key)
            base_key = dataset.pop("__rng__")

            def body(carry, idx_row):
                ts = carry
                batch = {k: jnp.take(v, idx_row, axis=0) for k, v in dataset.items()}
                # unique, resumable per-iteration stream keyed by step count
                rng = jax.random.fold_in(base_key, ts.step)
                ts, m = self._step(ts, batch, rng, None)
                return ts, m

            return jax.lax.scan(body, ts, idx)

        return jax.jit(run, donate_argnums=0)

    def step_scan(self, ts: TrainState, dataset: dict, idx, rng: jax.Array) -> tuple:
        """Run ``idx.shape[0]`` fused iterations; ``dataset`` holds the
        full device-resident arrays keyed like a batch dict, ``idx`` is
        [K, B] int32 example indices.  Metrics come back stacked [K, ...]."""
        payload = dict(dataset)
        payload["__rng__"] = rng
        return self._jitted_scan(ts, payload, jnp.asarray(idx, jnp.int32))

    # ------------------------------------------------------------ sample
    @functools.partial(jax.jit, static_argnums=0)
    def sample(self, ts: TrainState, z: jax.Array, y_onehot: jax.Array) -> jax.Array:
        """``gen_sampler``: generator with BN in inference mode
        (``mnist/model.py:733-757``)."""
        ctx = Ctx(params=ts.params, state=ts.state, rng=None, init=False,
                  train=False, update_sn=False, compute_dtype=self.compute_dtype)
        return generator(ctx, self.cfg, z, y_onehot, train=False).astype(jnp.float32)
