"""Model zoo shape/parameter tests + parity checks on architecture wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx, count_params
from rcgan_tpu.models import dcgan, resnet_gan


def make_ctx(rng=None, init=True):
    return Ctx(rng=rng or jax.random.key(0), init=init)


# ------------------------------------------------------------------ MNIST
def test_mnist_generator_shapes():
    cfg = dcgan.DCGANConfig(batch_size=4)
    ctx = make_ctx()
    z = jnp.zeros((4, cfg.z_dim))
    y = jnp.eye(10)[:4]
    out = dcgan.generator(ctx, cfg, z, y)
    assert out.shape == (4, 28, 28, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))
    # layer inventory matches the reference generator
    for name in ["g_h0_lin", "g_h1_lin", "g_h2", "g_h3", "g_bn0", "g_bn1", "g_bn2"]:
        assert name in ctx.params or name in ctx.state, name


@pytest.mark.parametrize("disc_type", ["vanilla", "projection"])
def test_mnist_discriminator_shapes(disc_type):
    cfg = dcgan.DCGANConfig(batch_size=4, disc_type=disc_type, spectral_norm=True)
    ctx = make_ctx()
    img = jnp.zeros((4, 28, 28, 1))
    y = jnp.eye(10)[:4]
    prob, logits = dcgan.discriminator(ctx, cfg, img, y)
    assert prob.shape == (4, 1) and logits.shape == (4, 1)
    if disc_type == "projection":
        assert "d_h5_y_lin" in ctx.params
        # SN state exists for the convs
        assert "u" in ctx.state["d_h0_conv"]


def test_mnist_all_label_fastpath_equals_tiled():
    """The factorized all-label projection path must equal per-label calls."""
    cfg = dcgan.DCGANConfig(batch_size=3, disc_type="projection", spectral_norm=False,
                            concat_y=False, max_norm=False)
    ctx = make_ctx()
    img = jax.random.normal(jax.random.key(1), (3, 28, 28, 1))
    fast = dcgan.discriminator_all_labels(ctx, cfg, img)

    # oracle: explicit loop over one-hot labels, reusing the same params
    ctx2 = Ctx(params=ctx.params, state=ctx.updated_state(), init=False)
    cols = []
    for i in range(10):
        y = jnp.tile(jnp.eye(10)[i], (3, 1))
        _, logits = dcgan.discriminator(ctx2, cfg, img, y)
        cols.append(logits[:, 0])
    oracle = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(fast, oracle, rtol=2e-4, atol=1e-5)


def test_mnist_generator_sampler_uses_moving_stats():
    cfg = dcgan.DCGANConfig(batch_size=4)
    ctx = make_ctx()
    z = jax.random.normal(jax.random.key(0), (4, cfg.z_dim))
    y = jnp.eye(10)[:4]
    dcgan.generator(ctx, cfg, z, y, train=True)
    params, state = ctx.params, ctx.updated_state()

    ctx_eval = Ctx(params=params, state=state, init=False, train=False)
    out_eval = dcgan.generator(ctx_eval, cfg, z, y, train=False)
    # eval pass must not write BN state
    assert not ctx_eval.new_state
    assert out_eval.shape == (4, 28, 28, 1)


# ------------------------------------------------------------------ CIFAR
def small_cifar_cfg(**kw):
    return resnet_gan.ResnetGANConfig(dim_g=16, dim_d=16, embedding_dim=24, **kw)


def test_cifar_generator_shapes_and_range():
    cfg = small_cifar_cfg()
    ctx = make_ctx()
    z = jax.random.normal(jax.random.key(0), (2, cfg.z_dim))
    labels = jnp.array([0, 5])
    out = resnet_gan.generator(ctx, cfg, z, labels)
    assert out.shape == (2, 3072)
    assert np.abs(np.asarray(out)).max() <= 1.0
    # cond-BN tables are per-class
    assert ctx.params["G.Block.1.N1"]["scale"].shape == (10, 16 * 8)


def test_cifar_discriminator_shapes():
    cfg = small_cifar_cfg()
    ctx = make_ctx()
    x = jax.random.normal(jax.random.key(0), (2, 3072))
    feat, wgan = resnet_gan.discriminator(ctx, cfg, x, jnp.array([1, 2]))
    assert feat.shape == (2, 16) and wgan.shape == (2,)
    # every D conv/linear is spectral-normed
    for name in ["D.Block.1.Conv1", "D.Block.2.Conv1", "D.Output"]:
        assert "u" in ctx.state[name], name


def test_cifar_projection_and_all_label_logits():
    cfg = small_cifar_cfg()
    ctx = make_ctx()
    x = jax.random.normal(jax.random.key(0), (4, 3072))
    labels = jnp.array([0, 1, 2, 3])
    feat, wgan = resnet_gan.discriminator(ctx, cfg, x, labels)
    resnet_gan.discriminator_projection(ctx, cfg, labels)  # create params
    params, state = ctx.params, ctx.updated_state()

    # Sequential SN calls chain the power-iteration u within one trace, so
    # compare the two paths from identical (params, state) contexts.
    ctx1 = Ctx(params=params, state=state, init=False, update_sn=False)
    emb = resnet_gan.discriminator_projection(ctx1, cfg, labels)
    logit = resnet_gan.projection_logits(feat, wgan, emb)
    ctx2 = Ctx(params=params, state=state, init=False, update_sn=False)
    all_logits = resnet_gan.all_label_logits(ctx2, cfg, feat, wgan)
    assert all_logits.shape == (4, 10)
    # the all-label matrix at each example's own label equals the single logit
    np.testing.assert_allclose(all_logits[jnp.arange(4), labels], logit, rtol=2e-4, atol=1e-5)


def test_cifar_param_count_full_size():
    """Full-size generator parameter census: the reference topology gives
    G.Input 128x16384 (2.10M) + up-block 1 (1024->256: 3.24M incl. shortcut)
    + blocks 2-3 (1.25M each) + output conv + cond-BN tables = 7.88M."""
    cfg = resnet_gan.ResnetGANConfig()
    ctx = make_ctx()
    z = jnp.zeros((2, cfg.z_dim))
    labels = jnp.array([0, 1])
    resnet_gan.generator(ctx, cfg, z, labels)
    g_params = {k: v for k, v in ctx.params.items() if k.startswith("G.")}
    n = count_params(g_params)
    assert n == 7_875_587, n


def test_perm_classifier_variants():
    for pt in ("linear", "2layer"):
        cfg = small_cifar_cfg(perm_type=pt)
        ctx = make_ctx()
        logits = resnet_gan.perm_classifier(ctx, cfg, jnp.zeros((2, 3072)))
        assert logits.shape == (2, 10)
