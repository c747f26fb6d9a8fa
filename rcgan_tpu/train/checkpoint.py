"""Checkpoint/resume via orbax (reference: ``tf.train.Saver`` —
``mnist/model.py:836-867``; ``cifar10/gan_resnet.py:905-914`` with
``max_to_keep=5`` and latest-checkpoint auto-resume).

The full :class:`TrainState` is captured — params, confusion logits, BN
moving stats, SN ``u`` vectors, and all optimizer slots — matching the
reference's Saver-saves-all-variables behavior (SURVEY §5.4).  Also provides
``optimistic_restore``-style partial loading (``common/misc.py:275-307``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from rcgan_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, ts: TrainState, wait: bool = False):
        """Asynchronous by default: the D2H transfer + write overlap training
        (the reference saves EVERY iteration for the first 500,
        ``gan_resnet.py:1007`` — blocking there costs ~10s/step through a
        remote-device tunnel).  ``wait=True`` or :meth:`close` finalizes."""
        payload = {
            "groups": ts.groups,
            "state": ts.state,
            "opt_states": ts.opt_states,
            "step": ts.step,
        }
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self.mgr.wait_until_finished()

    def close(self):
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.mgr.wait_until_finished()
        return self.mgr.latest_step()

    def restore_sharded(
        self,
        ts_template: TrainState,
        shardings: TrainState,
        step: Optional[int] = None,
    ) -> Optional[TrainState]:
        """Restore a (possibly GSPMD-sharded) checkpoint directly onto a
        device mesh: each leaf is materialized with the requested
        ``NamedSharding`` (per-shard reads via orbax's OCDBT/zarr layout —
        no full-array host staging), so a state saved from one mesh shape
        restores onto any other.  ``shardings``: a TrainState-shaped tree of
        ``jax.sharding.Sharding`` (see ``parallel.gspmd.train_state_shardings``).
        """
        self.mgr.wait_until_finished()
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None

        def abstract(x, sh):
            x = jax.numpy.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

        template = {
            "groups": jax.tree_util.tree_map(abstract, ts_template.groups, shardings.groups),
            "state": jax.tree_util.tree_map(abstract, ts_template.state, shardings.state),
            "opt_states": jax.tree_util.tree_map(
                abstract, ts_template.opt_states, shardings.opt_states
            ),
            "step": abstract(ts_template.step, shardings.step),
        }
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        return TrainState(
            groups=restored["groups"],
            state=restored["state"],
            opt_states=restored["opt_states"],
            step=restored["step"],
        )

    def restore(self, ts_template: TrainState, step: Optional[int] = None) -> Optional[TrainState]:
        """Restore into the template's structure; None when no checkpoint."""
        self.mgr.wait_until_finished()
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        template = {
            "groups": ts_template.groups,
            "state": ts_template.state,
            "opt_states": ts_template.opt_states,
            "step": ts_template.step,
        }
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        return TrainState(
            groups=restored["groups"],
            state=restored["state"],
            opt_states=restored["opt_states"],
            step=restored["step"],
        )


def optimistic_restore(ts_template: TrainState, directory: str) -> tuple:
    """Shape-tolerant partial restore: copies only leaves whose path+shape
    match the template (the ``optimistic_restore`` capability,
    ``cifar10/common/misc.py:275-307``).  Returns (state, n_loaded)."""
    ckpt = Checkpointer(directory)
    step = ckpt.latest_step()
    if step is None:
        return ts_template, 0
    raw = ckpt.mgr.restore(step)  # unstructured pytree of arrays

    loaded = [0]

    def merge_tree(tpl, new):
        if isinstance(tpl, dict):
            return {
                k: merge_tree(tpl[k], new[k]) if isinstance(new, dict) and k in new else tpl[k]
                for k in tpl
            }
        if new is not None and np.shape(tpl) == np.shape(new):
            loaded[0] += 1
            return jax.numpy.asarray(new)
        return tpl

    template = {
        "groups": ts_template.groups,
        "state": ts_template.state,
        "opt_states": ts_template.opt_states,
        "step": ts_template.step,
    }
    merged = merge_tree(template, raw)
    return (
        TrainState(
            groups=merged["groups"],
            state=merged["state"],
            opt_states=merged["opt_states"],
            step=merged["step"],
        ),
        loaded[0],
    )
