"""End-to-end trainer smoke tests: every mode steps, losses are finite,
the right parameters move, constraints hold, checkpoints round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
from rcgan_tpu.algorithms.mnist import MnistAlgoConfig
from rcgan_tpu.data.confusion import build_confusion
from rcgan_tpu.models.dcgan import DCGANConfig
from rcgan_tpu.models.resnet_gan import ResnetGANConfig
from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig
from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig


def mnist_batch(b=8, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "images": jnp.asarray(rs.rand(b, 28, 28, 1).astype(np.float32)),
        "y_real": jnp.asarray(rs.randint(10, size=b)),
        "y_gen": jnp.asarray(rs.randint(10, size=b)),
        "y_fake": jnp.asarray(rs.randint(10, size=b)),
        "y_real_weights": jnp.asarray(rs.rand(b, 10).astype(np.float32)),
    }


MNIST_MODES = [
    # (algorithm, disc_type, loss_fn, estimate_confuse, perm_reg, sn, max_norm, concat_y)
    ("biased", "vanilla", "ce", False, False, False, False, False),
    ("unbiased", "projection", "hinge", False, False, True, True, False),
    ("rcgan", "projection", "hinge", False, False, True, True, False),
    ("rcgan", "projection", "hinge", True, True, True, True, False),  # rcgan-u
    ("ambient", "vanilla", "ce", False, False, False, False, False),
    ("rcgan", "projection", "hinge", False, False, True, True, True),  # rcgan+y
]


@pytest.mark.parametrize("alg,disc,loss,est,perm,sn,mn,cy", MNIST_MODES)
def test_mnist_mode_steps(alg, disc, loss, est, perm, sn, mn, cy):
    cfg = DCGANConfig(batch_size=8, z_dim=16, gf_dim=8, df_dim=8, gfc_dim=32, dfc_dim=32,
                      disc_type=disc, spectral_norm=sn, max_norm=mn, concat_y=cy)
    acfg = MnistAlgoConfig(algorithm=alg, estimate_confuse=est, perm_regularizer=perm,
                           loss_fn=loss)
    tcfg = MnistTrainConfig(g_steps=2)
    c, _ = build_confusion(0.7, 10)
    tr = MnistTrainer(cfg, acfg, tcfg, c)
    batch = mnist_batch()
    ts = tr.init(jax.random.key(0), batch)

    g0 = jax.tree_util.tree_map(np.asarray, ts.groups["gen"])
    ts, m = tr.step(ts, batch, jax.random.key(1))
    assert np.isfinite(float(m["d_loss"]))
    assert np.isfinite(float(m["g_loss"]))
    # generator actually moved
    moved = any(
        not np.allclose(g0[k][n], ts.groups["gen"][k][n]) for k in g0 for n in g0[k]
    )
    assert moved
    if est:
        assert "confusion_logits" in ts.groups["confusion"]
    if mn:
        w = np.asarray(ts.groups["disc"]["d_h4_lin"]["Matrix"])
        assert np.abs(w).max() <= 1.0 + 1e-6

    # sampling works and uses inference BN
    z = jnp.zeros((8, cfg.z_dim))
    y = jnp.eye(10, dtype=jnp.float32)[jnp.arange(8) % 10]
    s = tr.sample(ts, z, y)
    assert s.shape == (8, 28, 28, 1)


CIFAR_MODES = [
    ("biased", False), ("unbiased", False), ("rcgan", False), ("rcgan-u", True),
]


@pytest.mark.parametrize("alg,perm", CIFAR_MODES)
def test_cifar_mode_cycles(alg, perm):
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm=alg)
    acfg = CifarAlgoConfig(algorithm=alg, perm_classifier=perm, confuse_init=(alg == "rcgan-u"))
    tcfg = CifarTrainConfig(n_critic=2, gen_bs_multiple=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c)
    b = 4
    ts = tr.init(jax.random.key(0), b)

    rs = np.random.RandomState(0)
    d_batches = {
        "images": jnp.asarray(rs.randint(0, 256, (2, b, 3072)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 10, (2, b)), jnp.int32),
        "labels_random": jnp.asarray(rs.randint(0, 10, (2, b)), jnp.int32),
        "labels_biased": jnp.asarray(rs.randint(0, 10, (2, b)), jnp.int32),
        "labels_inv_weights": jnp.asarray(rs.rand(2, b, 10), jnp.float32),
    }
    g_labels = {
        "random": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
        "biased": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
    }

    d0 = jax.tree_util.tree_map(np.asarray, ts.groups["disc"])
    ts, m = tr.step(ts, d_batches, g_labels, 0, jax.random.key(1))
    assert np.isfinite(float(m["d_cost"]))
    # iteration 0 skips the G step (gan_resnet.py:928)
    assert float(m["g_cost"]) == 0.0
    ts, m = tr.step(ts, d_batches, g_labels, 1, jax.random.key(2))
    assert np.isfinite(float(m["g_cost"])) and float(m["g_cost"]) != 0.0
    moved = any(
        not np.allclose(d0[k][n], ts.groups["disc"][k][n]) for k in d0 for n in d0[k]
    )
    assert moved
    if alg == "rcgan-u":
        assert "confusion_logits" in ts.groups["confusion"]


def test_cifar_static_unroll_matches_rolled():
    """The static_unroll cycle variant (Python-level G step + critic loop,
    used by bench/profiling to get a true per-cycle flop count out of XLA's
    cost analysis, which counts a lax.scan body only once) must be
    numerically identical to the rolled lax.cond/lax.scan hot path for any
    iteration > 0."""
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=3, gen_bs_multiple=2)
    c, _ = build_confusion(0.6, 10)
    tr = CifarTrainer(cfg, acfg, tcfg, c)
    b = 4
    ts = tr.init(jax.random.key(0), b)
    rs = np.random.RandomState(0)
    nc = tcfg.n_critic
    d_batches = {
        "images": jnp.asarray(rs.randint(0, 256, (nc, b, 3072)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 10, (nc, b)), jnp.int32),
        "labels_random": jnp.asarray(rs.randint(0, 10, (nc, b)), jnp.int32),
        "labels_biased": jnp.asarray(rs.randint(0, 10, (nc, b)), jnp.int32),
        "labels_inv_weights": jnp.asarray(rs.rand(nc, b, 10), jnp.float32),
    }
    g_labels = {
        "random": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
        "biased": jnp.asarray(rs.randint(0, 10, (2 * b,)), jnp.int32),
    }
    it = jnp.asarray(1, jnp.int32)
    key = jax.random.key(7)
    ts_r, m_r = jax.jit(lambda t, r: tr._cycle(t, d_batches, g_labels, it, r, None, None))(ts, key)
    ts_u, m_u = jax.jit(
        lambda t, r: tr._cycle(t, d_batches, g_labels, it, r, None, None, static_unroll=True)
    )(ts, key)
    # identical math modulo XLA reassociation (fusion order changes f32
    # reduction order; Adam's rsqrt amplifies it — measured ~4e-5 max)
    for a, bb in zip(jax.tree_util.tree_leaves(ts_r.groups), jax.tree_util.tree_leaves(ts_u.groups)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=0, atol=5e-4)
    for k in m_r:
        np.testing.assert_allclose(np.asarray(m_r[k]), np.asarray(m_u[k]), rtol=1e-5, atol=1e-4)


def test_cifar_lr_decay_profile():
    from rcgan_tpu.algorithms.cifar import lr_decay

    assert float(lr_decay(0)) == 1.0
    np.testing.assert_allclose(float(lr_decay(40000)), 0.6, rtol=1e-6)
    assert float(lr_decay(60000)) == 0.5
    assert float(lr_decay(10, decay=False)) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    from rcgan_tpu.train.checkpoint import Checkpointer

    cfg = DCGANConfig(batch_size=4, z_dim=8, gf_dim=4, df_dim=4, gfc_dim=16, dfc_dim=16,
                      disc_type="vanilla", spectral_norm=False, max_norm=False)
    acfg = MnistAlgoConfig(algorithm="biased", loss_fn="ce")
    tr = MnistTrainer(cfg, acfg, MnistTrainConfig(), build_confusion(0.7, 10)[0])
    batch = mnist_batch(4)
    ts = tr.init(jax.random.key(0), batch)
    ts, _ = tr.step(ts, batch, jax.random.key(1))

    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(1, ts)
    ts2 = tr.init(jax.random.key(5), batch)
    restored = ck.restore(ts2)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.groups["gen"]["g_h0_lin"]["Matrix"]),
        np.asarray(ts.groups["gen"]["g_h0_lin"]["Matrix"]),
    )
    assert int(restored.step) == 1


def test_mnist_step_scan_matches_sequential_steps():
    """The fused lax.scan epoch path must produce the same training
    trajectory as per-call steps over the same data and rng derivation."""
    cfg = DCGANConfig(batch_size=4, z_dim=8, gf_dim=4, df_dim=4, gfc_dim=16, dfc_dim=16,
                      disc_type="projection", spectral_norm=True, max_norm=True)
    acfg = MnistAlgoConfig(algorithm="rcgan", loss_fn="hinge")
    c, _ = build_confusion(0.7, 10)
    tr = MnistTrainer(cfg, acfg, MnistTrainConfig(), c)

    rs = np.random.RandomState(0)
    n, b, k = 32, 4, 3
    dataset = {
        "images": jnp.asarray(rs.rand(n, 28, 28, 1).astype(np.float32)),
        "y_real": jnp.asarray(rs.randint(10, size=n)),
        "y_gen": jnp.asarray(rs.randint(10, size=n)),
        "y_fake": jnp.asarray(rs.randint(10, size=n)),
        "y_real_weights": jnp.asarray(rs.rand(n, 10).astype(np.float32)),
    }
    idx = jnp.asarray(rs.permutation(n)[: k * b].reshape(k, b), jnp.int32)
    batch0 = {kk: v[idx[0]] for kk, v in dataset.items()}

    ts_a = tr.init(jax.random.key(0), batch0)
    ts_b = tr.init(jax.random.key(0), batch0)
    base = jax.random.key(7)

    ts_a, ms = tr.step_scan(ts_a, dataset, idx, base)
    assert ms["d_loss"].shape == (k,)

    seq_losses = []
    for j in range(k):
        batch = {kk: v[idx[j]] for kk, v in dataset.items()}
        rng = jax.random.fold_in(base, ts_b.step)
        ts_b, m = tr.step(ts_b, batch, rng)
        seq_losses.append(float(m["d_loss"]))

    # the per-step losses ARE the trajectory: step j's loss is computed
    # from the params produced by steps < j, so matching losses at 1e-5
    # means the parameter trajectories agree wherever they matter
    np.testing.assert_allclose(np.asarray(ms["d_loss"]), seq_losses, rtol=1e-5, atol=1e-6)
    # functional equivalence of the final states: identical z -> samples.
    # (Raw param-delta comparison is NOT meaningful here: for leaves with
    # structurally-vanishing gradients, scaleless Adam normalizes fp dust
    # into +-unit directions, so those deltas legitimately diverge between
    # any two fusions of the same math.)
    z = jnp.asarray(rs.uniform(-1, 1, (4, cfg.z_dim)).astype(np.float32))
    y = jnp.asarray(np.eye(10, dtype=np.float32)[rs.randint(10, size=4)])
    np.testing.assert_allclose(
        np.asarray(tr.sample(ts_a, z, y)), np.asarray(tr.sample(ts_b, z, y)),
        rtol=1e-3, atol=2e-3,
    )


def test_cifar_device_dataset_matches_host_fed():
    """Device-resident dataset (index batches) must produce bit-identical
    costs to host-fed batches on the same data/keys."""
    from rcgan_tpu.data.confusion import build_confusion as _bc

    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2, gen_bs_multiple=2)
    c, _ = _bc(0.6, 10)
    b, n = 4, 32
    rs = np.random.RandomState(0)
    dataset = {
        "images": rs.randint(0, 256, (n, 3072)).astype(np.int32),
        "labels": rs.randint(0, 10, n).astype(np.int32),
        "labels_random": rs.randint(0, 10, n).astype(np.int32),
        "labels_biased": rs.randint(0, 10, n).astype(np.int32),
        "labels_inv_weights": rs.rand(n, 10).astype(np.float32),
    }
    idx = np.stack([np.arange(0, b), np.arange(b, 2 * b)]).astype(np.int32)
    host_batches = {k: jnp.asarray(np.stack([v[idx[0]], v[idx[1]]])) for k, v in dataset.items()}
    g_labels = {
        "random": jnp.asarray(rs.randint(0, 10, 2 * b).astype(np.int32)),
        "biased": jnp.asarray(rs.randint(0, 10, 2 * b).astype(np.int32)),
    }

    tr_host = CifarTrainer(cfg, acfg, tcfg, c)
    tr_dev = CifarTrainer(cfg, acfg, tcfg, c, device_dataset=dataset)
    ts_h = tr_host.init(jax.random.key(0), b)
    ts_d = tr_dev.init(jax.random.key(0), b)

    ts_h, m_h = tr_host.step(ts_h, host_batches, g_labels, 1, jax.random.key(5))
    ts_d, m_d = tr_dev.step(ts_d, {"index": jnp.asarray(idx)}, g_labels, 1, jax.random.key(5))
    np.testing.assert_allclose(float(m_h["d_cost"]), float(m_d["d_cost"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_h["g_cost"]), float(m_d["g_cost"]), rtol=1e-6)


def test_cifar_step_scan_matches_sequential_steps():
    """The fused K-cycle lax.scan path must produce the same training
    trajectory as per-call steps over the same indices and rng derivation
    (the CIFAR analogue of the MNIST fused-epoch equivalence)."""
    from rcgan_tpu.apps.cifar_app import device_dataset_of
    from rcgan_tpu.data.cifar10 import synthetic_cifar, _make_split

    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    tcfg = CifarTrainConfig(n_critic=2)
    c, _ = build_confusion(0.6, 10)

    x, y = synthetic_cifar(64, seed=5)
    split = _make_split(x, y, alpha=0.6, seed=6)
    dd = device_dataset_of(split)

    b, k = 8, 3
    rs = np.random.RandomState(1)
    idx = rs.randint(0, 64, (k, tcfg.n_critic, b)).astype(np.int32)
    g_random = rs.randint(0, 10, (k, 2 * b)).astype(np.int32)
    g_biased = rs.randint(0, 10, (k, 2 * b)).astype(np.int32)
    base = jax.random.key(11)

    tr_a = CifarTrainer(cfg, acfg, tcfg, c, device_dataset=dd)
    ts_a = tr_a.init(jax.random.key(0), b)
    ts_a, ms = tr_a.step_scan(ts_a, idx, g_random, g_biased, base)
    assert ms["d_cost"].shape == (k,)

    tr_b = CifarTrainer(cfg, acfg, tcfg, c, device_dataset=dd)
    ts_b = tr_b.init(jax.random.key(0), b)
    seq_d, seq_g = [], []
    for j in range(k):
        rng = jax.random.fold_in(base, ts_b.step)
        ts_b, m = tr_b.step(ts_b, {"index": jnp.asarray(idx[j])},
                            {"random": jnp.asarray(g_random[j]),
                             "biased": jnp.asarray(g_biased[j])},
                            int(ts_b.step), rng)
        seq_d.append(float(m["d_cost"]))
        seq_g.append(float(m["g_cost"]))

    np.testing.assert_allclose(np.asarray(ms["d_cost"]), seq_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ms["g_cost"]), seq_g, rtol=1e-5, atol=1e-6)
    # functional equivalence of the final states: identical z -> samples
    z = jnp.asarray(rs.randn(4, cfg.z_dim).astype(np.float32))
    lab = jnp.asarray(rs.randint(0, 10, 4).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(tr_a.sample(ts_a, z, lab)), np.asarray(tr_b.sample(ts_b, z, lab)),
        rtol=1e-3, atol=2e-3,
    )


def test_mnist_confuse_init_diag_dominant():
    """MNIST --confuse_init (port of gan_resnet.py:504-520): the learned C
    starts as softmax of the diagonal-dominant logits, i.e. diagonal mass
    equals confuse_init_diag (for diag <= 0.99)."""
    cfg = DCGANConfig(batch_size=8, z_dim=16, gf_dim=8, df_dim=8, gfc_dim=32, dfc_dim=32,
                      disc_type="projection", spectral_norm=True, max_norm=True)
    acfg = MnistAlgoConfig(algorithm="rcgan", estimate_confuse=True, perm_regularizer=True,
                           loss_fn="hinge", confuse_init=True, confuse_init_diag=0.4)
    tr = MnistTrainer(cfg, acfg, MnistTrainConfig(), build_confusion(0.7, 10)[0])
    ts = tr.init(jax.random.key(0), mnist_batch())
    logits = np.asarray(ts.groups["confusion"]["confusion_logits"]["logits"])
    c0 = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    # softmax of the reference's logits (aa = log(V d/(1-d)), diag aa-aa/V,
    # off -aa/V) gives diagonal e^aa/(e^aa + V-1) — slightly above d itself
    r = 10 * 0.4 / 0.6
    np.testing.assert_allclose(np.diag(c0), r / (r + 9), rtol=1e-5)
    off = c0[~np.eye(10, dtype=bool)]
    np.testing.assert_allclose(off, 1 / (r + 9), rtol=1e-5)


def test_scaleless_adam_bf16_moments_matches_f32_direction():
    """The low-precision-moment Adam (state.py::_scale_by_adam_lowp) stores
    bf16 moments but computes the same direction as optax f32 Adam to bf16
    tolerance, and its state leaves really are bf16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rcgan_tpu.train.state import scaleless_adam

    params = {"l": {"w": jnp.asarray(np.random.RandomState(0).randn(16, 8), jnp.float32)}}
    g1 = {"l": {"w": jnp.asarray(np.random.RandomState(1).randn(16, 8), jnp.float32)}}
    g2 = {"l": {"w": jnp.asarray(np.random.RandomState(2).randn(16, 8), jnp.float32)}}

    ref = scaleless_adam(0.0, 0.9)
    lowp = scaleless_adam(0.0, 0.9, moment_dtype="bfloat16")
    s_ref, s_lowp = ref.init(params), lowp.init(params)
    assert s_lowp.mu["l"]["w"].dtype == jnp.bfloat16
    assert s_lowp.nu["l"]["w"].dtype == jnp.bfloat16

    for g in (g1, g2):
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_lowp, s_lowp = lowp.update(g, s_lowp, params)
        np.testing.assert_allclose(
            np.asarray(u_ref["l"]["w"]), np.asarray(u_lowp["l"]["w"]),
            rtol=0.05, atol=0.05,
        )
    # directions are descent-aligned elementwise (sign agreement)
    agree = (np.sign(np.asarray(u_ref["l"]["w"])) == np.sign(np.asarray(u_lowp["l"]["w"]))).mean()
    assert agree > 0.95
