"""Worker process for the 2-process ``jax.distributed`` CPU harness test
(tests/test_multihost.py).  Each process owns 2 virtual CPU devices; the
global mesh spans 4 devices across both processes over the same gRPC
coordination path a real multi-host DCN deployment uses.

Run:  python tests/multihost_worker.py <process_id> <coordinator_port>
Prints one line:  RESULT <pid> <d_cost> <g_cost> <d_cost2>
"""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from rcgan_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
    from rcgan_tpu.data.cifar10 import synthetic_cifar, _make_split
    from rcgan_tpu.data.confusion import build_confusion
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.parallel.mesh import make_mesh
    from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

    mesh = make_mesh(4)
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan",
                          normalization_g=False)
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c, mesh=mesh)

    b = 16
    ts = tr.init(jax.random.key(0), b)
    # params/opt state are identical across processes (same rng); promote the
    # host-local arrays to globally-replicated arrays on the 2-process mesh.
    repl = NamedSharding(mesh, P())
    ts = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), ts)

    # ---- per-host input feeding: the epoch(shard=) contract.  Both
    # processes build the same deterministic split; each feeds only its own
    # contiguous half of every global batch.
    x, y = synthetic_cifar(64, seed=3)
    split = _make_split(x, y, alpha=0.6, seed=4)
    full = next(split.epoch(b))
    local = next(split.epoch(b, shard=(pid, 2)))
    half = b // 2
    for f, l in zip(full, local):  # the shard IS the pid-th slice
        np.testing.assert_array_equal(f[pid * half:(pid + 1) * half], l)

    def feed(spec, full_value, local_value):
        sharding = NamedSharding(mesh, spec)
        arr = jax.make_array_from_process_local_data(sharding, np.asarray(local_value))
        assert arr.shape == np.asarray(full_value).shape
        return arr

    n_critic = tcfg.n_critic
    imgs, labels, labels_random, labels_biased, inv_w = full
    l_imgs, l_labels, l_random, l_biased, l_inv = local

    def rep_critic(a):  # same batch at every critic step (deterministic test)
        return np.broadcast_to(np.asarray(a), (n_critic,) + np.asarray(a).shape).copy()

    d_batches = {
        "images": feed(P(None, "data"), rep_critic(imgs.astype(np.int32)),
                       rep_critic(l_imgs.astype(np.int32))),
        "labels": feed(P(None, "data"), rep_critic(labels), rep_critic(l_labels)),
        "labels_random": feed(P(None, "data"), rep_critic(labels_random),
                              rep_critic(l_random)),
        "labels_biased": feed(P(None, "data"), rep_critic(labels_biased),
                              rep_critic(l_biased)),
        "labels_inv_weights": feed(P(None, "data"),
                                   rep_critic(inv_w.astype(np.float32)),
                                   rep_critic(l_inv.astype(np.float32))),
    }
    # [2b] on the data axis: each device holds 2b/4 contiguous rows, so
    # process p's addressable portion is the contiguous [p*b, (p+1)*b) slice.
    g_full = np.concatenate([labels_random, labels_random])
    g_local = g_full[pid * b:(pid + 1) * b]
    g_labels = {
        "random": feed(P("data"), g_full, g_local),
        "biased": feed(P("data"), g_full, g_local),
    }

    ts, m = tr.step(ts, d_batches, g_labels, 1, jax.random.key(5))
    d1, g1 = float(m["d_cost"]), float(m["g_cost"])
    ts, m2 = tr.step(ts, d_batches, g_labels, 2, jax.random.key(6))
    d2 = float(m2["d_cost"])
    print(f"RESULT {pid} {d1:.8f} {g1:.8f} {d2:.8f}", flush=True)


if __name__ == "__main__":
    main()
