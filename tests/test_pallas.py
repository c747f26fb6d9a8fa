"""Pallas kernels vs jnp oracles (interpreter mode on the CPU test mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.ops.pallas.norm_kernel import cond_batchnorm_bhwc, cond_batchnorm_fused
from rcgan_tpu.ops.pallas.projection_kernel import all_label_projection_logits


def test_cond_batchnorm_fused_matches_reference_math():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 6, 8).astype(np.float32))  # [B, S, C]
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(4, 8).astype(np.float32))
    offset = jnp.asarray(0.1 * rs.randn(4, 8).astype(np.float32))

    out = cond_batchnorm_fused(x, scale, offset, 1e-5)

    mean = np.mean(np.asarray(x), axis=(0, 1), keepdims=True)
    var = np.var(np.asarray(x), axis=(0, 1), keepdims=True)
    ref = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    ref = ref * np.asarray(scale)[:, None, :] + np.asarray(offset)[:, None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_cond_batchnorm_fused_grads_match_autodiff_oracle():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(3, 5, 8).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(3, 8).astype(np.float32))
    offset = jnp.asarray(0.1 * rs.randn(3, 8).astype(np.float32))

    def jnp_ref(x, s, o):
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(0, 1), keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(jnp.sin(xhat * s[:, None, :] + o[:, None, :]))

    def fused(x, s, o):
        return jnp.sum(jnp.sin(cond_batchnorm_fused(x, s, o, 1e-5)))

    g_ref = jax.grad(jnp_ref, argnums=(0, 1, 2))(x, scale, offset)
    g_fused = jax.grad(fused, argnums=(0, 1, 2))(x, scale, offset)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_cond_batchnorm_bhwc_wrapper_matches_op():
    from rcgan_tpu.core.module import Ctx
    from rcgan_tpu.ops.norm import cond_batchnorm

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 4, 4, 8).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 10, 4))
    ctx = Ctx(rng=jax.random.key(0), init=True)
    ref = cond_batchnorm(ctx, x, labels, 10, "cbn")
    out = cond_batchnorm_bhwc(
        x, labels, ctx.params["cbn"]["scale"], ctx.params["cbn"]["offset"]
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "b,s,c",
    [
        (128, 1024, 128),  # generator 32x32 map — previously XLA fallback
        (128, 256, 128),  # generator 16x16 at gen-batch 128
        (64, 256, 128),  # critic-batch 16x16
    ],
)
def test_cond_batchnorm_fused_covers_flagship_shapes(b, s, c):
    """The tiled two-pass kernel must handle every LARGE flagship generator
    map (VERDICT r1: the old single-block kernel excluded >=16^2 at batch
    64).  Tiny maps (<6 MB) deliberately route to XLA — see _MIN_FUSED_BYTES."""
    from rcgan_tpu.ops.pallas.norm_kernel import should_fuse

    assert should_fuse(b, s, c), "flagship shape must not fall back"
    rs = np.random.RandomState(b + s)
    x = jnp.asarray(rs.randn(b, s, c).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(b, c).astype(np.float32))
    offset = jnp.asarray(0.1 * rs.randn(b, c).astype(np.float32))
    out = cond_batchnorm_fused(x, scale, offset, 1e-5)
    xn = np.asarray(x)
    mean = np.mean(xn, axis=(0, 1), keepdims=True)
    var = np.var(xn, axis=(0, 1), keepdims=True)
    ref = (xn - mean) / np.sqrt(var + 1e-5)
    ref = ref * np.asarray(scale)[:, None, :] + np.asarray(offset)[:, None, :]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_sn_fused_matches_jnp_math_and_svd_oracle():
    from rcgan_tpu.ops.pallas.sn_kernel import fits_fused, sn_fused, sn_math

    rs = np.random.RandomState(5)
    w = jnp.asarray(rs.randn(1152, 128).astype(np.float32))  # 3x3x128 -> 128
    u0 = jnp.asarray(rs.randn(1, 128).astype(np.float32))
    assert fits_fused(1152, 128)

    wbar, unew, sigma = sn_fused(w, u0)
    wbar_r, unew_r, sigma_r = sn_math(w, u0)
    np.testing.assert_allclose(np.asarray(wbar), np.asarray(wbar_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(unew), np.asarray(unew_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(sigma), float(sigma_r), rtol=1e-5)

    # one power-iteration sigma is a lower bound within ~10% of true sigma_max
    # for a warm-started u; with a cold random u just check the bound+scale
    svd_sigma = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    assert float(sigma) <= svd_sigma * (1 + 1e-4)
    assert float(sigma) > 0.5 * svd_sigma


def test_sn_fused_gradients_flow_through_power_iteration():
    from rcgan_tpu.ops.pallas.sn_kernel import sn_fused, sn_math

    rs = np.random.RandomState(6)
    w = jnp.asarray(rs.randn(40, 24).astype(np.float32))
    u0 = jnp.asarray(rs.randn(1, 24).astype(np.float32))

    def loss_fused(w):
        wbar, _, _ = sn_fused(w, u0)
        return jnp.sum(jnp.tanh(wbar))

    def loss_ref(w):
        wbar, _, _ = sn_math(w, u0)
        return jnp.sum(jnp.tanh(wbar))

    g_f = jax.grad(loss_fused)(w)
    g_r = jax.grad(loss_ref)(w)
    # reference semantics = flow-through-iteration; Miyato stop-grad would
    # differ here by O(1) in the sigma term
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), rtol=1e-4, atol=1e-6)


def test_all_label_projection_logits_and_grads():
    rs = np.random.RandomState(3)
    feat = jnp.asarray(rs.randn(6, 16).astype(np.float32))
    emb = jnp.asarray(rs.randn(10, 16).astype(np.float32))
    wgan = jnp.asarray(rs.randn(6, 1).astype(np.float32))

    out = all_label_projection_logits(feat, emb, wgan)
    ref = np.asarray(wgan) + np.asarray(feat) @ np.asarray(emb).T
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def loss_fused(f, e, w):
        return jnp.sum(jnp.tanh(all_label_projection_logits(f, e, w)))

    def loss_ref(f, e, w):
        return jnp.sum(jnp.tanh(w + f @ e.T))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feat, emb, wgan)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(feat, emb, wgan)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dequantize_kernel_distribution():
    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_* has no CPU interpret lowering")
    from rcgan_tpu.ops.pallas.dequant_kernel import dequantize_fused

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randint(0, 256, (8, 3072)), jnp.int32)
    out = np.asarray(dequantize_fused(x, jnp.int32(7)))
    assert out.shape == (8, 3072)
    base = 2.0 * (np.asarray(x, np.float32) / 256.0 - 0.5)
    # CHW→HWC permutation applied to the noise-free part
    b = base.reshape(8, 3, 32, 32).transpose(0, 2, 3, 1).reshape(8, 3072)
    diff = out - b
    assert diff.min() >= 0.0
    assert diff.max() < 1.0 / 128
    # noise roughly uniform
    assert 0.2 / 128 < diff.mean() < 0.8 / 128


def test_projection_kernel_bf16_cotangent_dtypes(monkeypatch):
    """Regression: the fused projection kernel's VJP must return cotangents
    in the PRIMAL dtypes.  An f32 dwgan against a bf16 wgan trips JAX's
    aval-consistency assert when the caller slices the logits — exactly the
    unbiased all-label real pass under bf16 compute (crashed the first
    full-size CIFAR unbiased run on TPU)."""
    monkeypatch.setenv("RCGAN_PALLAS_PROJ", "1")

    from rcgan_tpu.ops.pallas.projection_kernel import all_label_projection_logits

    rs = np.random.RandomState(0)
    feat = jnp.asarray(rs.randn(8, 16), jnp.bfloat16)
    emb = jnp.asarray(rs.randn(10, 16), jnp.bfloat16)
    wgan = jnp.asarray(rs.randn(8, 1), jnp.bfloat16)

    def loss(f, e, w):
        logits = all_label_projection_logits(f, e, w)
        return jnp.sum(logits[:4].astype(jnp.float32))  # slice like unbiased

    df, de, dw = jax.grad(loss, argnums=(0, 1, 2))(feat, emb, wgan)
    assert df.dtype == feat.dtype
    assert de.dtype == emb.dtype
    assert dw.dtype == wgan.dtype
    # value check vs the jnp formula
    ref = jnp.sum((feat.astype(jnp.float32) @ emb.astype(jnp.float32).T
                   + wgan.astype(jnp.float32))[:4])
    got = loss(feat, emb, wgan)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)


# ------------------------------------------------------------- conv3x3
@pytest.mark.parametrize("b,h,w", [(4, 8, 8), (2, 16, 16), (1, 32, 32)])
def test_conv3x3_fused_matches_xla_conv(b, h, w):
    """Forward of the fused 3x3/s1/SAME kernel vs lax.conv_general_dilated
    on the flagship channel width (C=O=128)."""
    from rcgan_tpu.ops.pallas.conv_kernel import conv3x3_fused, supported

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, 128).astype(np.float32))
    wgt = jnp.asarray(0.1 * rs.randn(3, 3, 128, 128).astype(np.float32))
    assert supported(x.shape, wgt.shape)
    out = conv3x3_fused(x, wgt)
    ref = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv3x3_fused_grads_match_autodiff_oracle():
    """The custom VJP (two standard XLA convs) vs autodiff of the XLA conv."""
    from rcgan_tpu.ops.pallas.conv_kernel import conv3x3_fused

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 128).astype(np.float32))
    wgt = jnp.asarray(0.1 * rs.randn(3, 3, 128, 128).astype(np.float32))

    def ref_loss(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(jnp.sin(out))

    def fused_loss(x, w):
        return jnp.sum(jnp.sin(conv3x3_fused(x, w)))

    g_ref = jax.grad(ref_loss, argnums=(0, 1))(x, wgt)
    g_fused = jax.grad(fused_loss, argnums=(0, 1))(x, wgt)
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_conv3x3_routing_gates(monkeypatch):
    """maybe_conv3x3 returns None off-class or when routed off, and the fused
    result when forced on."""
    from rcgan_tpu.ops.pallas import conv_kernel

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 128).astype(np.float32))
    wgt = jnp.asarray(0.1 * rs.randn(3, 3, 128, 128).astype(np.float32))
    monkeypatch.delenv("RCGAN_PALLAS_CONV3X3", raising=False)
    # default routing is the measured default (currently off)
    assert conv_kernel._MEASURED_DEFAULT is False
    assert conv_kernel.maybe_conv3x3(x, wgt, 1, "SAME") is None
    monkeypatch.setenv("RCGAN_PALLAS_CONV3X3", "1")
    assert conv_kernel.maybe_conv3x3(x, wgt, 2, "SAME") is None  # stride off-class
    assert conv_kernel.maybe_conv3x3(x, wgt, 1, "VALID") is None
    out = conv_kernel.maybe_conv3x3(x, wgt, 1, "SAME")
    assert out is not None and out.shape == (2, 8, 8, 128)
    # off-class channels (not a multiple of 128) fall back
    w_small = jnp.asarray(0.1 * rs.randn(3, 3, 128, 64).astype(np.float32))
    assert conv_kernel.maybe_conv3x3(x, w_small, 1, "SAME") is None
