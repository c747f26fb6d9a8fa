"""Algorithm-level property tests — the invariants the reference's math
implies (SURVEY §4 oracles).

Key identities:
  * alpha=1 ⇒ C = I, C^-1 = I ⇒ unbiased ≡ biased (the importance weights
    select exactly the observed label).
  * rcgan with estimate_confuse and C frozen to near-one-hot rows ⇒ the
    expected fake loss collapses to the plain rcgan loss at y_fake = C(y_gen).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx
from rcgan_tpu.algorithms.mnist import MnistAlgoConfig, mnist_losses
from rcgan_tpu.algorithms.cifar import CifarAlgoConfig, disc_loss
from rcgan_tpu.data.confusion import build_confusion
from rcgan_tpu.models.dcgan import DCGANConfig
from rcgan_tpu.models.resnet_gan import ResnetGANConfig


def mnist_batch(b=6, seed=0):
    rs = np.random.RandomState(seed)
    y = rs.randint(10, size=b)
    return {
        "images": jnp.asarray(rs.rand(b, 28, 28, 1).astype(np.float32)),
        "y_real": jnp.asarray(y),
        "y_gen": jnp.asarray(y),  # shared so biased/unbiased see same pairs
        "y_fake": jnp.asarray(y),
        "y_real_weights": jnp.asarray(np.eye(10, dtype=np.float32)[y]),  # C=I rows
    }


def _mnist_cfg():
    return DCGANConfig(batch_size=6, z_dim=8, gf_dim=4, df_dim=4, gfc_dim=16, dfc_dim=16,
                       disc_type="projection", spectral_norm=False, max_norm=False)


def test_unbiased_equals_biased_when_alpha_one():
    cfg = _mnist_cfg()
    c, _ = build_confusion(1.0 - 1e-12, 10)  # ~identity (exactly 1 is singular-free too)
    batch = mnist_batch()
    z = jax.random.uniform(jax.random.key(1), (6, cfg.z_dim), minval=-1, maxval=1)

    # shared params: init once under unbiased (superset of layers)
    acfg_u = MnistAlgoConfig(algorithm="unbiased", loss_fn="hinge")
    ctx0 = Ctx(rng=jax.random.key(0), init=True)
    mnist_losses(ctx0, cfg, acfg_u, batch, z, jnp.asarray(np.eye(10, dtype=np.float32)))
    params, state = ctx0.params, ctx0.updated_state()

    def run(acfg):
        ctx = Ctx(params=params, state=state, init=False, update_sn=False)
        return mnist_losses(ctx, cfg, acfg, batch, z, jnp.asarray(np.eye(10, dtype=np.float32)))

    out_u = run(acfg_u)
    out_b = run(MnistAlgoConfig(algorithm="biased", loss_fn="hinge"))
    # identity weights pick out exactly the observed-label logit
    np.testing.assert_allclose(out_u["d_loss_real"], out_b["d_loss_real"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_u["d_loss_fake"], out_b["d_loss_fake"], rtol=1e-4, atol=1e-5)


def test_rcganu_expected_loss_collapses_to_rcgan_with_onehot_C():
    """With confusion logits frozen to a huge diagonal, softmax(C)[y] ≈
    onehot(y), so RCGAN-U's expected fake loss equals RCGAN's at
    y_fake = y_gen."""
    cfg = _mnist_cfg()
    batch = mnist_batch()
    z = jax.random.uniform(jax.random.key(2), (6, cfg.z_dim), minval=-1, maxval=1)
    c_id = jnp.asarray(np.eye(10, dtype=np.float32))

    acfg_u = MnistAlgoConfig(algorithm="rcgan", estimate_confuse=True, loss_fn="hinge")
    ctx0 = Ctx(rng=jax.random.key(0), init=True)
    mnist_losses(ctx0, cfg, acfg_u, batch, z, None)
    params, state = ctx0.params, ctx0.updated_state()
    params = dict(params)
    params["confusion_logits"] = {"logits": jnp.eye(10) * 60.0}

    ctx = Ctx(params=params, state=state, init=False, update_sn=False)
    out_u = mnist_losses(ctx, cfg, acfg_u, batch, z, None)

    acfg_r = MnistAlgoConfig(algorithm="rcgan", estimate_confuse=False, loss_fn="hinge")
    ctx2 = Ctx(params=params, state=state, init=False, update_sn=False)
    out_r = mnist_losses(ctx2, cfg, acfg_r, batch, z, c_id)

    np.testing.assert_allclose(out_u["d_loss_fake"], out_r["d_loss_fake"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out_u["g_loss"], out_r["g_loss"], rtol=1e-3, atol=1e-4)


def test_cifar_unbiased_identity_weights_match_biased_real_term():
    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="unbiased",
                          normalization_g=False)
    rs = np.random.RandomState(0)
    b = 4
    y = rs.randint(10, size=b).astype(np.int32)
    batch = {
        "real_data": jnp.asarray(rs.randn(b, 3072).astype(np.float32)),
        "labels": jnp.asarray(y),
        "labels_random": jnp.asarray(y),
        "labels_biased": jnp.asarray(y),
        "labels_inv_weights": jnp.asarray(np.eye(10, dtype=np.float32)[y]),
    }
    z = jax.random.normal(jax.random.key(1), (b, cfg.z_dim))
    c_id = jnp.asarray(np.eye(10, dtype=np.float32))

    acfg_u = CifarAlgoConfig(algorithm="unbiased")
    ctx0 = Ctx(rng=jax.random.key(0), init=True)
    disc_loss(ctx0, cfg, acfg_u, batch, z, c_id)
    params, state = ctx0.params, ctx0.updated_state()

    out_u = disc_loss(Ctx(params=params, state=state, init=False, update_sn=False),
                      cfg, acfg_u, batch, z, c_id)
    cfg_b = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="biased",
                            normalization_g=False)
    out_b = disc_loss(Ctx(params=params, state=state, init=False, update_sn=False),
                      cfg_b, CifarAlgoConfig(algorithm="biased"), batch, z, c_id)
    np.testing.assert_allclose(out_u["disc_cost"], out_b["disc_cost"], rtol=1e-4, atol=1e-5)


def test_cifar_cond_bn_label_gradients_flow_to_used_rows_only():
    """Conditioning mechanics: the generator loss gradient w.r.t. a cond-BN
    class row must be nonzero for labels present in the batch and exactly
    zero for absent labels."""
    from rcgan_tpu.algorithms.cifar import gen_loss as cifar_gen_loss

    cfg = ResnetGANConfig(dim_g=8, dim_d=8, embedding_dim=12, algorithm="rcgan")
    acfg = CifarAlgoConfig(algorithm="rcgan")
    b = 4
    labels = jnp.asarray([0, 0, 3, 3], jnp.int32)
    z = jax.random.normal(jax.random.key(1), (b, cfg.z_dim))
    c_id = jnp.asarray(np.eye(10, dtype=np.float32))

    ctx0 = Ctx(rng=jax.random.key(0), init=True)
    cifar_gen_loss(ctx0, cfg, acfg, labels, labels, z, c_id)
    params, state = ctx0.params, ctx0.updated_state()

    def loss(p):
        ctx = Ctx(params=p, state=state, init=False, update_sn=False)
        return cifar_gen_loss(ctx, cfg, acfg, labels, labels, z, c_id)["gen_cost"]

    grads = jax.grad(loss)(params)
    g_scale = np.asarray(grads["G.Block.1.N1"]["scale"])  # [10, C]
    used = np.abs(g_scale[[0, 3]]).sum()
    unused = np.abs(g_scale[[1, 2, 4, 5, 6, 7, 8, 9]]).sum()
    assert used > 0.0
    np.testing.assert_allclose(unused, 0.0, atol=1e-12)
