"""Unit tests for the op layer against NumPy/SciPy oracles.

Mirrors the oracles the reference hands us (SURVEY §4): spectral-norm sigma
vs SVD, conv/deconv vs torch CPU, normalization formulas by hand.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.core.module import Ctx, transform
from rcgan_tpu.ops import (
    batch_norm,
    cond_batchnorm,
    conv2d,
    conv2d_lib,
    conv_cond_concat,
    deconv2d,
    embed_y,
    exact_sigma,
    instance_norm,
    layer_norm,
    linear,
    linear_lib,
    lrelu,
    mean_pool,
    pixel_norm,
    spectral_normed_weight,
    upsample_depth_to_space,
)


def run_once(f, *args, train=True, update_sn=True):
    t = transform(f)
    params, state = t.init(jax.random.key(0), *args)
    out, new_state = t.apply(params, state, jax.random.key(1), *args, train=train, update_sn=update_sn)
    return params, state, out, new_state


# --------------------------------------------------------------------- sn
def test_spectral_norm_converges_to_svd_sigma():
    w = jax.random.normal(jax.random.key(3), (5, 5, 16, 32))

    def f(ctx):
        return spectral_normed_weight(ctx, "lay", w, num_iters=50, with_sigma=True)

    _, _, (w_bar, sigma), _ = run_once(f)
    sigma_true = exact_sigma(w)
    np.testing.assert_allclose(sigma, sigma_true, rtol=1e-3)
    np.testing.assert_allclose(exact_sigma(w_bar), 1.0, rtol=1e-3)


def test_spectral_norm_u_update_gated():
    w = jax.random.normal(jax.random.key(4), (8, 4))

    def f(ctx):
        return spectral_normed_weight(ctx, "lay", w)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    _, ns_updated = t.apply(params, state, None, update_sn=True)
    _, ns_frozen = t.apply(params, state, None, update_sn=False)
    assert not np.allclose(ns_updated["lay"]["u"], state["lay"]["u"])
    np.testing.assert_array_equal(ns_frozen["lay"]["u"], state["lay"]["u"])


def test_spectral_norm_chains_within_one_trace():
    # Two sequential calls in one trace must chain u (TF control-dep order).
    w = jax.random.normal(jax.random.key(5), (8, 4))

    def f2(ctx):
        spectral_normed_weight(ctx, "lay", w)
        return spectral_normed_weight(ctx, "lay", w)

    def f1(ctx):
        return spectral_normed_weight(ctx, "lay", w)

    t1, t2 = transform(f1), transform(f2)
    params, state = t1.init(jax.random.key(0))
    _, s_once = t1.apply(params, state, None)
    _, s_once_again = t1.apply(params, s_once, None)
    _, s_twice = t2.apply(params, state, None)
    np.testing.assert_allclose(
        s_twice["lay"]["u"], s_once_again["lay"]["u"], rtol=1e-6, atol=1e-7
    )


# ------------------------------------------------------------------ conv
def test_conv2d_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)

    def f(ctx):
        return conv2d(ctx, jnp.asarray(x), 7, "c", k=5, stride=2)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    out, _ = t.apply(params, state, None)

    w = np.asarray(params["c"]["w"])  # HWIO
    # TF/XLA SAME for k=5,s=2,in=8: total pad 3, asymmetric (1 before, 2 after)
    xp = np.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    conv = torch.nn.functional.conv2d(
        torch.from_numpy(xp.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(w.transpose(3, 2, 0, 1).copy()),
        bias=torch.from_numpy(np.asarray(params["c"]["biases"])),
        stride=2,
        padding=0,
    )
    np.testing.assert_allclose(out, conv.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5)


def test_deconv2d_is_vjp_of_forward_same_conv():
    """TF conv2d_transpose is *defined* as the gradient of a forward SAME
    conv w.r.t. its input; check our op against that definitional oracle."""
    x = np.random.RandomState(1).randn(2, 7, 7, 4).astype(np.float32)

    def f(ctx):
        return deconv2d(ctx, jnp.asarray(x), 6, "d", k=5, stride=2)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    out, _ = t.apply(params, state, None)
    assert out.shape == (2, 14, 14, 6)

    w = jnp.asarray(params["d"]["w"])  # [k,k,cout,cin] TF layout

    def fwd(y):  # [2,14,14,6] -> [2,7,7,4]
        return jax.lax.conv_general_dilated(
            y, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    _, vjp = jax.vjp(fwd, jnp.zeros((2, 14, 14, 6)))
    ref = vjp(jnp.asarray(x))[0] + np.asarray(params["d"]["biases"])
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_conv2d_lib_shapes_and_sn():
    x = jnp.ones((2, 32, 32, 3))

    def f(ctx):
        return conv2d_lib(ctx, x, 3, 16, 3, 1, "C", spectral_normed=True)

    _, _, out, ns = run_once(f)
    assert out.shape == (2, 32, 32, 16)
    assert "u" in ns["C"]


def test_conv2d_lib_weightnorm_numpy_oracle():
    """weightnorm (``conv2d.py:152-162``): effective filter = W * g/||W||
    with per-output-channel norms over (h, w, cin); ``g`` is a trainable param
    initialized to the init-time norms, so at init the op is an identity
    reparameterization (same output as weightnorm=False on the same key)."""
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 8, 8, 3)).astype(np.float32))

    def f(ctx):
        return conv2d_lib(ctx, x, 3, 16, 3, 1, "C", weightnorm=True)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    w = np.asarray(params["C"]["Filters"])
    g = np.asarray(params["C"]["g"])
    np.testing.assert_allclose(g, np.sqrt(np.square(w).sum(axis=(0, 1, 2))), rtol=1e-6)
    out, _ = t.apply(params, state, None)

    def f_plain(ctx):
        return conv2d_lib(ctx, x, 3, 16, 3, 1, "C", weightnorm=False)

    tp = transform(f_plain)
    params_p, state_p = tp.init(jax.random.key(0))
    out_p, _ = tp.apply(params_p, state_p, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=1e-5, atol=1e-5)

    # after perturbing g, the effective filter is W * g/||W|| — NumPy oracle
    params["C"]["g"] = params["C"]["g"] * 2.0
    out2, _ = t.apply(params, state, None)
    np.testing.assert_allclose(np.asarray(out2), 2.0 * np.asarray(out_p), rtol=1e-4, atol=1e-4)
    # and g is trainable: gradients flow to it
    grads = jax.grad(lambda p: jnp.sum(t.apply(p, state, None)[0] ** 2))(params)
    assert float(jnp.abs(grads["C"]["g"]).sum()) > 0.0


def test_linear_lib_weightnorm_numpy_oracle():
    """weightnorm (``linear.py:143-155``): W_eff = W * g/||W||_cols; identity
    at init, scales columns with g afterwards."""
    x = jnp.asarray(np.random.RandomState(1).normal(size=(4, 7)).astype(np.float32))

    def f(ctx):
        return linear_lib(ctx, x, 7, 5, "L", weightnorm=True, initialization="he")

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    w = np.asarray(params["L"]["W"])
    g = np.asarray(params["L"]["g"])
    np.testing.assert_allclose(g, np.sqrt(np.square(w).sum(axis=0)), rtol=1e-6)
    out, _ = t.apply(params, state, None)
    w_eff = w * (g / np.sqrt(np.square(w).sum(axis=0)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x) @ w_eff + np.asarray(params["L"]["b"]),
        rtol=1e-5, atol=1e-5,
    )
    params["L"]["g"] = params["L"]["g"] * jnp.asarray(np.arange(1.0, 6.0, dtype=np.float32))
    out2, _ = t.apply(params, state, None)
    w_eff2 = w * (np.arange(1.0, 6.0, dtype=np.float32) * g / np.sqrt(np.square(w).sum(axis=0)))
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(x) @ w_eff2 + np.asarray(params["L"]["b"]),
        rtol=1e-5, atol=1e-5,
    )


def test_mean_pool_and_upsample():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    mp = mean_pool(x)
    assert mp.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(mp[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4.0)

    up = upsample_depth_to_space(jnp.array([[[[1.0], [2.0]], [[3.0], [4.0]]]]))
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(up)[0, :2, :2, 0], [[1, 1], [1, 1]])
    np.testing.assert_array_equal(np.asarray(up)[0, 2:, 2:, 0], [[4, 4], [4, 4]])


def test_conv_cond_concat():
    x = jnp.zeros((2, 4, 4, 3))
    y = jnp.eye(10)[:2]
    out = conv_cond_concat(x, y)
    assert out.shape == (2, 4, 4, 13)
    np.testing.assert_array_equal(np.asarray(out)[1, 3, 3, 3:], np.asarray(y[1]))


# ---------------------------------------------------------------- linear
def test_linear_and_constraint_registration():
    x = jnp.ones((3, 7))

    def f(ctx):
        return linear(ctx, x, 5, "d_h4_lin", max_norm=True)

    t = transform(f)
    params, state, constraints = t.init_full(jax.random.key(0))
    assert constraints["d_h4_lin"]["Matrix"] == (-1.0, 1.0)
    out, _ = t.apply(params, state, None)
    np.testing.assert_allclose(
        out, np.asarray(x) @ np.asarray(params["d_h4_lin"]["Matrix"]) + np.asarray(params["d_h4_lin"]["bias"]),
        rtol=1e-5,
    )


def test_linear_lib_orthogonal_default_square():
    def f(ctx):
        return linear_lib(ctx, jnp.ones((2, 16)), 16, 16, "L")

    t = transform(f)
    params, _ = t.init(jax.random.key(0))
    w = np.asarray(params["L"]["W"])
    np.testing.assert_allclose(w.T @ w, np.eye(16), atol=1e-5)


def test_embed_y():
    def f(ctx):
        return embed_y(ctx, jnp.array([1, 3]), 10, 8)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    out, _ = t.apply(params, state, None)
    np.testing.assert_array_equal(out[0], params["Embedding.Label"]["embedding_map"][1])
    assert np.abs(np.asarray(params["Embedding.Label"]["embedding_map"])).max() <= 0.08


# ----------------------------------------------------------------- norms
def test_batch_norm_train_vs_eval():
    x = jax.random.normal(jax.random.key(0), (16, 4, 4, 3)) * 3 + 1

    def f(ctx):
        return batch_norm(ctx, x, "bn")

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    out, ns = t.apply(params, state, None, train=True)
    np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out).std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # moving stats moved toward batch stats
    assert not np.allclose(ns["bn"]["moving_mean"], 0.0)

    out_eval, ns_eval = t.apply(params, state, None, train=False)
    # eval mode uses (initial) moving stats: mean 0 var 1 -> identity-ish
    np.testing.assert_allclose(out_eval, np.asarray(x), atol=1e-4)
    assert np.allclose(ns_eval["bn"]["moving_mean"], state["bn"]["moving_mean"])


def test_batch_norm_zero_debias():
    x = jnp.ones((8, 3)) * 5.0

    def f(ctx):
        return batch_norm(ctx, x, "bn", zero_debias=True)

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    _, ns = t.apply(params, state, None, train=True)
    # After one update the debiased moving mean equals the batch mean
    # (up to float32 pow() precision in the debias factor).
    np.testing.assert_allclose(ns["bn"]["moving_mean"], 5.0, rtol=1e-4)


def test_cond_batchnorm_uses_batch_stats_and_labels():
    x = jax.random.normal(jax.random.key(0), (8, 4, 4, 6)) * 2 + 3
    labels = jnp.array([0, 1] * 4)

    def f(ctx):
        return cond_batchnorm(ctx, x, labels, 10, "cbn")

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    assert params["cbn"]["offset"].shape == (10, 6)
    # no moving-average state by design
    assert "cbn" not in state or not state.get("cbn")
    out, _ = t.apply(params, state, None, train=False)  # still batch stats
    np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1, 2)), 0.0, atol=1e-4)


def test_layer_instance_pixel_norm_shapes():
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 5))

    def f(ctx):
        return (
            layer_norm(ctx, x, "ln"),
            instance_norm(ctx, x, "in"),
            pixel_norm(x),
        )

    _, _, (ln, inorm, pn), _ = run_once(f)
    np.testing.assert_allclose(np.asarray(ln).mean(axis=(1, 2, 3)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(inorm).mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose((np.asarray(pn) ** 2).mean(axis=3), 1.0, rtol=1e-4)


def test_lrelu():
    np.testing.assert_allclose(lrelu(jnp.array([-1.0, 2.0])), [-0.2, 2.0])


def test_conv2d_lib_depthwise_and_separable():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))

    def f(ctx):
        dw = conv2d_lib(ctx, x, 4, 0, 3, 1, "dw", conv_type="depthwise_conv2d",
                        channel_multiplier=2)
        sep = conv2d_lib(ctx, x, 4, 6, 3, 1, "sep", conv_type="separable_conv2d",
                         channel_multiplier=2)
        return dw, sep

    _, _, (dw, sep), _ = run_once(f)
    assert dw.shape == (2, 8, 8, 8)  # cin * multiplier
    assert sep.shape == (2, 8, 8, 6)


def test_conv2d_lib_pixelcnn_mask_causality():
    """Masked conv output at pixel (i,j) must not depend on future pixels."""
    x = jax.random.normal(jax.random.key(1), (1, 6, 6, 2))

    def f(ctx):
        return conv2d_lib(ctx, x, 2, 4, 3, 1, "m", mask_type=("a", 1))

    t = transform(f)
    params, state = t.init(jax.random.key(0))
    base, _ = t.apply(params, state, None)

    x2 = x.at[0, 4:, :, :].set(123.0)  # poke future rows
    ctx = Ctx(params=params, state=state, init=False)
    from rcgan_tpu.ops import conv2d_lib as c2l

    out2 = c2l(ctx, x2, 2, 4, 3, 1, "m", mask_type=("a", 1))
    np.testing.assert_allclose(base[0, :4], out2[0, :4], rtol=1e-5)


def test_mnist_vanilla_all_labels_matches_loop():
    from rcgan_tpu.models import dcgan

    cfg = dcgan.DCGANConfig(batch_size=3, disc_type="vanilla", dfc_dim=16, df_dim=4)
    ctx = Ctx(rng=jax.random.key(0), init=True)
    img = jax.random.normal(jax.random.key(1), (3, 28, 28, 1))
    tiled = dcgan.discriminator_all_labels(ctx, cfg, img)
    params, state = ctx.params, ctx.updated_state()

    cols = []
    for i in range(10):
        y = jnp.tile(jnp.eye(10)[i], (3, 1))
        ctx2 = Ctx(params=params, state=state, init=False)
        _, logits = dcgan.discriminator(ctx2, cfg, img, y)
        cols.append(logits[:, 0])
    oracle = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(tiled, oracle, rtol=2e-4, atol=2e-5)


def test_embed_y_frozen_table_no_grads():
    table = np.random.RandomState(0).randn(10, 8).astype(np.float32)

    def f(ctx, labels):
        return embed_y(ctx, labels, 10, 8, name="E", frozen_table=jnp.asarray(table))

    t = transform(f)
    labels = jnp.array([2, 5])
    params, state = t.init(jax.random.key(0), labels)
    assert "E" not in params  # frozen → state, not trainable params
    out, _ = t.apply(params, state, None, labels)
    np.testing.assert_allclose(out, table[[2, 5]], rtol=1e-6)
