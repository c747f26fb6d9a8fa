"""Data-parallel equivalence: N-way sharded training must match the
single-device run on identical data — the property the reference's 1-GPU
device-aliasing hack implicitly asserts (``cifar10/gan_resnet.py:187-188``,
SURVEY §4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
from rcgan_tpu.data.confusion import build_confusion
from rcgan_tpu.models.resnet_gan import ResnetGANConfig
from rcgan_tpu.parallel.mesh import make_mesh
from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig


def make_data(b, n_critic=2, seed=0):
    rs = np.random.RandomState(seed)
    d_batches = {
        "images": jnp.asarray(rs.randint(0, 256, (n_critic, b, 3072)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 10, (n_critic, b)), jnp.int32),
        "labels_random": jnp.asarray(rs.randint(0, 10, (n_critic, b)), jnp.int32),
        "labels_biased": jnp.asarray(rs.randint(0, 10, (n_critic, b)), jnp.int32),
        "labels_inv_weights": jnp.asarray(rs.rand(n_critic, b, 10), jnp.float32),
    }
    g_labels = {
        "random": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
        "biased": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
    }
    return d_batches, g_labels


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_cycle_runs_and_stays_replicated():
    mesh = make_mesh(8)
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c, mesh=mesh)
    b = 16  # 2 per device
    ts = tr.init(jax.random.key(0), b)
    d_batches, g_labels = make_data(b)
    ts, m = tr.step(ts, d_batches, g_labels, 1, jax.random.key(1))
    assert np.isfinite(float(m["d_cost"]))
    assert np.isfinite(float(m["g_cost"]))

    # one more step to confirm the donated/sharded state round-trips
    ts, m = tr.step(ts, d_batches, g_labels, 2, jax.random.key(2))
    assert np.isfinite(float(m["d_cost"]))


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single_device_near_exact(n_devices):
    """Same data, same init → the N-way sharded cycle must match the
    unsharded one to float tolerance: z and dequantization noise are keyed
    by GLOBAL example index (core/rng.py), so the only residual difference
    is reduction ordering.  Checks costs AND parameter deltas after 2 steps
    (the reference's device-aliasing property, gan_resnet.py:187-188).
    Per-shard batch-norm moments are the one layout-dependent piece, so the
    test model disables G normalization."""
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan",
                          normalization_g=False)
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    b = 16  # 2 per device on the widest mesh

    tr_sh = CifarTrainer(cfg, acfg, tcfg, c, mesh=make_mesh(n_devices))
    tr_1 = CifarTrainer(cfg, acfg, tcfg, c, mesh=None)

    # identical init: same rng, same per-device shapes do not affect params
    ts_sh = tr_sh.init(jax.random.key(0), b)
    ts_1 = tr_1.init(jax.random.key(0), b)
    np.testing.assert_allclose(
        np.asarray(ts_sh.groups["gen"]["G.Input"]["W"]),
        np.asarray(ts_1.groups["gen"]["G.Input"]["W"]),
    )
    init_groups = {
        g: jax.tree_util.tree_map(np.asarray, ts_1.groups[g]) for g in ("gen", "disc")
    }

    d_batches, g_labels = make_data(b)
    for it in (1, 2):
        ts_sh, m_sh = tr_sh.step(ts_sh, d_batches, g_labels, it, jax.random.key(2 + it))
        ts_1, m_1 = tr_1.step(ts_1, d_batches, g_labels, it, jax.random.key(2 + it))
        np.testing.assert_allclose(
            float(m_sh["d_cost"]), float(m_1["d_cost"]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(m_sh["g_cost"]), float(m_1["g_cost"]), rtol=1e-4, atol=1e-5
        )

    # parameter DELTAS after 2 steps must agree (not just the losses);
    # tolerance is relative to the update magnitude, not the weight.
    for group in ("gen", "disc"):
        flat_sh = jax.tree_util.tree_leaves(ts_sh.groups[group])
        flat_1 = jax.tree_util.tree_leaves(ts_1.groups[group])
        flat_0 = jax.tree_util.tree_leaves(init_groups[group])
        for a, b_, p0 in zip(flat_sh, flat_1, flat_0):
            d_sh = np.asarray(a) - p0
            d_1 = np.asarray(b_) - p0
            scale = max(float(np.max(np.abs(d_1))), 1e-8)
            # atol 2e-3 of the update magnitude: psum-vs-single-sum reduction
            # ordering feeds Adam's rsqrt(v) normalizer, which amplifies
            # near-zero grads ~10x over two steps (observed: <0.01% of
            # elements at <1e-3).  Wiring bugs (missing psum, double
            # averaging) produce O(1) discrepancies and still fail loudly.
            np.testing.assert_allclose(d_sh / scale, d_1 / scale, rtol=1e-4, atol=2e-3)


def test_mnist_sharded_step_runs():
    from rcgan_tpu.algorithms.mnist import MnistAlgoConfig
    from rcgan_tpu.models.dcgan import DCGANConfig
    from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig

    mesh = make_mesh(4)
    cfg = DCGANConfig(batch_size=8, z_dim=8, gf_dim=4, df_dim=4, gfc_dim=16, dfc_dim=16,
                      disc_type="projection", spectral_norm=True, max_norm=True)
    acfg = MnistAlgoConfig(algorithm="rcgan", estimate_confuse=True, perm_regularizer=True,
                           loss_fn="hinge")
    c, _ = build_confusion(0.7, 10)
    tr = MnistTrainer(cfg, acfg, MnistTrainConfig(), c, mesh=mesh)
    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.rand(8, 28, 28, 1).astype(np.float32)),
        "y_real": jnp.asarray(rs.randint(10, size=8)),
        "y_gen": jnp.asarray(rs.randint(10, size=8)),
        "y_fake": jnp.asarray(rs.randint(10, size=8)),
        "y_real_weights": jnp.asarray(rs.rand(8, 10).astype(np.float32)),
    }
    ts = tr.init(jax.random.key(0), batch)
    ts, m = tr.step(ts, batch, jax.random.key(1))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    assert m["prob_real"].shape == (8,)
    ts, m = tr.step(ts, batch, jax.random.key(2))
    assert np.isfinite(float(m["d_loss"]))


def test_checkpoint_sharded_roundtrip(tmp_path):
    """Save a GSPMD-sharded train state from a 4x2 (data, model) mesh and
    restore it onto a DIFFERENT mesh shape (2x4) with per-shard reads
    (SURVEY §5.4; VERDICT r1 item 8)."""
    from rcgan_tpu.parallel.gspmd import (
        apply_shardings,
        make_dp_tp_mesh,
        train_state_shardings,
    )
    from rcgan_tpu.train.checkpoint import Checkpointer

    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c, mesh=None)
    ts = tr.init(jax.random.key(0), 8)
    ref_w = np.asarray(ts.groups["gen"]["G.Input"]["W"])

    mesh_a = make_dp_tp_mesh(4, 2)
    ts_a = apply_shardings(ts, train_state_shardings(mesh_a, ts))
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(3, ts_a, wait=True)

    # restore onto a different mesh shape with different TP partitioning
    mesh_b = make_dp_tp_mesh(2, 4)
    shard_b = train_state_shardings(mesh_b, ts)
    restored = ck.restore_sharded(ts, shard_b, step=3)
    assert restored is not None
    w = restored.groups["gen"]["G.Input"]["W"]
    assert w.sharding == shard_b.groups["gen"]["G.Input"]["W"]
    np.testing.assert_array_equal(np.asarray(w), ref_w)
    np.testing.assert_array_equal(
        np.asarray(restored.groups["disc"]["D.Output"]["W"]),
        np.asarray(ts.groups["disc"]["D.Output"]["W"]),
    )
    assert int(restored.step) == int(ts.step)
    ck.close()


@pytest.mark.slow
def test_checkpoint_sharded_16dev_scale(tmp_path):
    """Scale the cross-mesh-shape sharded restore past the session's 8-device
    cap (ROADMAP item 5): a fresh interpreter with 16 virtual CPU devices
    saves from a 4x4 ('data','model') mesh and restores onto 8x2, asserting
    bit-equality and placement.  Subprocess because device count is fixed at
    jax import."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "ckpt_scale_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own 16-device flag
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, worker, str(tmp_path / "ckpt")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    assert "RESULT ok" in out.stdout


def test_gspmd_dp_tp_cycle():
    """GSPMD path: 4x2 ('data','model') mesh with tensor-sharded wide layers;
    XLA inserts collectives. Must produce finite costs and keep stepping."""
    from rcgan_tpu.parallel.gspmd import (
        apply_shardings,
        gspmd_cycle,
        make_dp_tp_mesh,
        train_state_shardings,
    )

    mesh = make_dp_tp_mesh(4, 2)
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan-u")
    acfg = CifarAlgoConfig(algorithm="rcgan-u", perm_classifier=True, confuse_init=True)
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c, mesh=None)
    b = 8
    ts = tr.init(jax.random.key(0), b)
    ts = apply_shardings(ts, train_state_shardings(mesh, ts))
    step = gspmd_cycle(tr, mesh)

    d_batches, g_labels = make_data(b)
    ts, m = step(ts, d_batches, g_labels, jnp.asarray(1, jnp.int32), jax.random.key(1))
    assert np.isfinite(float(m["d_cost"])) and np.isfinite(float(m["g_cost"]))
    ts, m = step(ts, d_batches, g_labels, jnp.asarray(2, jnp.int32), jax.random.key(2))
    assert np.isfinite(float(m["d_cost"]))
