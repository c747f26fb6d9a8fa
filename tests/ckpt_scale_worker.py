"""Worker process for the 16-device sharded-checkpoint scale test
(tests/test_parallel.py::test_checkpoint_sharded_16dev_scale).

Runs in its own interpreter so it can force 16 virtual CPU devices (the
pytest session is pinned at 8 by conftest).  Saves a GSPMD-sharded train
state from a 4x4 ('data','model') mesh, restores it onto an 8x2 mesh —
different dp/tp factorization, different per-shard file layout — and
asserts bit-equality with the pre-shard values plus correct placement.

Run:  python tests/ckpt_scale_worker.py <ckpt_dir>
Prints one line on success:  RESULT ok
"""

import os
import sys


def main():
    ckpt_dir = sys.argv[1]
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    assert len(jax.devices()) == 16, jax.devices()

    import numpy as np

    from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
    from rcgan_tpu.data.confusion import build_confusion
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.parallel.gspmd import (
        apply_shardings,
        make_dp_tp_mesh,
        train_state_shardings,
    )
    from rcgan_tpu.train.checkpoint import Checkpointer
    from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=16, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c, mesh=None)
    ts = tr.init(jax.random.key(0), 8)
    ref_gin = np.asarray(ts.groups["gen"]["G.Input"]["W"])
    ref_dout = np.asarray(ts.groups["disc"]["D.Output"]["W"])

    mesh_a = make_dp_tp_mesh(4, 4)
    ts_a = apply_shardings(ts, train_state_shardings(mesh_a, ts))
    ck = Checkpointer(ckpt_dir)
    ck.save(7, ts_a, wait=True)

    mesh_b = make_dp_tp_mesh(8, 2)
    shard_b = train_state_shardings(mesh_b, ts)
    restored = ck.restore_sharded(ts, shard_b, step=7)
    assert restored is not None
    w = restored.groups["gen"]["G.Input"]["W"]
    assert w.sharding == shard_b.groups["gen"]["G.Input"]["W"], w.sharding
    np.testing.assert_array_equal(np.asarray(w), ref_gin)
    np.testing.assert_array_equal(
        np.asarray(restored.groups["disc"]["D.Output"]["W"]), ref_dout
    )
    assert int(restored.step) == int(ts.step)
    ck.close()
    print("RESULT ok", flush=True)


if __name__ == "__main__":
    main()
