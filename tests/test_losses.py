"""Loss-formula hand-checks against the reference's closed forms."""

import numpy as np

import jax
import jax.numpy as jnp

from rcgan_tpu.algorithms.losses import d_fake_loss, d_real_loss, g_loss, sigmoid_ce


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


X = jnp.array([-3.0, -0.5, 0.0, 0.7, 4.0])
XN = np.asarray(X)


def test_hinge():
    np.testing.assert_allclose(d_real_loss(X, "HINGE"), np.maximum(0, 1 - XN), rtol=1e-6)
    np.testing.assert_allclose(d_fake_loss(X, "HINGE"), np.maximum(0, 1 + XN), rtol=1e-6)
    np.testing.assert_allclose(g_loss(X, "HINGE"), -XN, rtol=1e-6)


def test_goodfellow_matches_log_sigmoid_forms():
    np.testing.assert_allclose(d_real_loss(X, "Goodfellow"), -np.log(sigmoid(XN)), rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        d_fake_loss(X, "Goodfellow"), -np.log(1 - sigmoid(XN)), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(g_loss(X, "Goodfellow"), -np.log(sigmoid(XN)), rtol=5e-4, atol=1e-6)


def test_ce_equals_sigmoid_cross_entropy():
    # MNIST 'ce': CE vs ones (real/G) and zeros (fake) (mnist/model.py:139-145)
    np.testing.assert_allclose(
        d_real_loss(X, "ce"), np.asarray(sigmoid_ce(X, jnp.ones_like(X))), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        d_fake_loss(X, "ce"), np.asarray(sigmoid_ce(X, jnp.zeros_like(X))), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        g_loss(X, "ce"), np.asarray(sigmoid_ce(X, jnp.ones_like(X))), rtol=5e-4, atol=1e-6
    )


def test_wgan():
    np.testing.assert_allclose(d_real_loss(X, "WGAN"), -XN, rtol=1e-6)
    np.testing.assert_allclose(d_fake_loss(X, "WGAN"), XN, rtol=1e-6)
    np.testing.assert_allclose(g_loss(X, "WGAN"), -XN, rtol=1e-6)


def test_softplus_variants():
    sp = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)
    np.testing.assert_allclose(
        d_real_loss(X, "HINGE", soft_plus=True), sp(-np.minimum(0, -1 + XN)), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        d_fake_loss(X, "HINGE", soft_plus=True), sp(-np.minimum(0, -1 - XN)), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        d_real_loss(X, "Goodfellow", soft_plus=True), -sp(np.log(sigmoid(XN))) * 1.0,
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(g_loss(X, "WGAN", soft_plus=True), sp(-XN), rtol=5e-4, atol=1e-6)


def test_sigmoid_ce_against_manual():
    logits = jnp.array([[2.0, -1.0], [0.0, 3.0]])
    targets = jnp.array([[1.0, 0.0], [0.5, 1.0]])
    ref = np.maximum(np.asarray(logits), 0) - np.asarray(logits) * np.asarray(targets) + np.log1p(
        np.exp(-np.abs(np.asarray(logits)))
    )
    np.testing.assert_allclose(sigmoid_ce(logits, targets), ref, rtol=5e-4, atol=1e-6)
