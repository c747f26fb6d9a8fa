"""Inception-v3 scorer: architecture, weight loader, and numerics.

The reference's paper-scale scorer is Google's frozen Inception-v3
(``cifar10/common/inception/inception_score_.py:26-48``); ours is a JAX
reimplementation fed by a torchvision-named state dict.  Real weights are
not downloadable here, so these tests pin (a) the conv+frozen-BN numerics
against torch, (b) the full graph's shape flow with shape-correct random
weights, and (c) the loader/validator contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcgan_tpu.evals import inception_v3 as iv3


def test_conv_bn_matches_torch_numerics():
    torch = pytest.importorskip("torch")

    rs = np.random.RandomState(0)
    x = rs.randn(2, 11, 11, 5).astype(np.float32)
    w = rs.randn(7, 5, 3, 3).astype(np.float32)
    gamma = rs.rand(7).astype(np.float32) + 0.5
    beta = rs.randn(7).astype(np.float32)
    mean = rs.randn(7).astype(np.float32)
    var = rs.rand(7).astype(np.float32) + 0.5

    params = {
        "blk.conv.weight": jnp.asarray(w),
        "blk.bn.weight": jnp.asarray(gamma),
        "blk.bn.bias": jnp.asarray(beta),
        "blk.bn.running_mean": jnp.asarray(mean),
        "blk.bn.running_var": jnp.asarray(var),
    }
    ours = np.asarray(iv3._conv_bn(params, "blk", jnp.asarray(x), stride=2, padding=1))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    out = torch.nn.functional.conv2d(xt, torch.tensor(w), stride=2, padding=1)
    out = torch.nn.functional.batch_norm(
        out, torch.tensor(mean), torch.tensor(var), torch.tensor(gamma),
        torch.tensor(beta), training=False, eps=1e-3,
    )
    ref = torch.relu(out).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_avg_pool_matches_torch_count_include_pad():
    torch = pytest.importorskip("torch")

    rs = np.random.RandomState(1)
    x = rs.randn(2, 9, 9, 4).astype(np.float32)
    ours = np.asarray(iv3._avg_pool_3x3_same(jnp.asarray(x)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.avg_pool2d(xt, 3, stride=1, padding=1)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)


def test_full_forward_shapes_and_finiteness():
    params = {k: jnp.asarray(v) for k, v in iv3.random_weights(0).items()}
    x = jnp.asarray(np.random.RandomState(2).randn(2, 299, 299, 3).astype(np.float32))
    logits = iv3.inception_v3_logits(params, x)
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_make_logits_fn_accepts_flat_cifar_layout():
    params = iv3.random_weights(1)
    fn = iv3.make_logits_fn(params)
    flat = jnp.asarray(np.random.RandomState(3).rand(2, 3072).astype(np.float32) * 2 - 1)
    logits = fn(flat)
    assert logits.shape == (2, 1000)


def test_preprocess_range_and_shape():
    x = jnp.ones((2, 32, 32, 3), jnp.float32)  # +1 in [-1,1] -> 1.0 in [0,1]
    out = iv3.preprocess(x)
    assert out.shape == (2, 299, 299, 3)
    expect = (1.0 - iv3._MEAN) / iv3._STD
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect, rtol=1e-5)


def test_validate_weights_catches_missing_and_misshaped():
    good = iv3.random_weights(0)
    iv3.validate_weights(good)

    missing = dict(good)
    del missing["Mixed_7c.branch_pool.conv.weight"]
    with pytest.raises(ValueError, match="missing"):
        iv3.validate_weights(missing)

    bad = dict(good)
    bad["fc.weight"] = bad["fc.weight"][:, :100]
    with pytest.raises(ValueError, match="fc.weight"):
        iv3.validate_weights(bad)


def test_load_weights_npz_roundtrip(tmp_path):
    w = iv3.random_weights(0)
    w["AuxLogits.fc.weight"] = np.zeros((1000, 768), np.float32)  # must be stripped
    w["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.asarray(7)
    path = str(tmp_path / "inception_v3.npz")
    np.savez(path, **w)
    loaded = iv3.load_weights(path)
    assert "AuxLogits.fc.weight" not in loaded
    assert not any(k.endswith("num_batches_tracked") for k in loaded)
    iv3.validate_weights(loaded)
    assert iv3.find_weights(str(tmp_path)) == path


def test_score_math_anchor_sanity():
    """A perfectly confident, perfectly uniform-marginal classifier scores
    exp(log 10) = 10 under the KL-splits estimator — the math behind the
    11.31 anchor (1000-way, near-one-hot)."""
    from rcgan_tpu.evals.inception import preds_to_score

    preds = np.full((1000, 10), 1e-9)
    preds[np.arange(1000), np.arange(1000) % 10] = 1.0 - 9e-9
    mean, std = preds_to_score(preds, splits=10)
    assert abs(mean - 10.0) < 0.05
    assert std < 0.05


def test_full_graph_golden_pin():
    """Golden pin of the ENTIRE graph (VERDICT r2 item 3): fixed
    random_weights(0) + a fixed input must reproduce committed per-block
    shapes, mean/std checksums, and final logits.  A wrong stride, padding,
    or branch order in any of the 94 layers shifts its block's checksum
    (and everything downstream) orders of magnitude beyond tolerance.

    Regenerate (only after an INTENTIONAL semantic change):
    python scripts/gen_inception_golden.py
    """
    import os

    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "inception_v3_golden.npz")
    golden = dict(np.load(golden_path))

    params = {k: jnp.asarray(v) for k, v in iv3.random_weights(0).items()}
    x = np.random.RandomState(1).uniform(-2.0, 2.0, (2, 299, 299, 3)).astype(np.float32)
    logits, blocks = jax.jit(iv3.inception_v3_blocks)(params, jnp.asarray(x))

    block_names = {k[len("shape."):] for k in golden if k.startswith("shape.")}
    assert set(blocks) == block_names
    for name in sorted(block_names):
        v = np.asarray(blocks[name])
        assert tuple(v.shape) == tuple(golden[f"shape.{name}"]), name
        np.testing.assert_allclose(v.mean(), golden[f"mean.{name}"],
                                   rtol=2e-3, atol=1e-4, err_msg=name)
        np.testing.assert_allclose(v.std(), golden[f"std.{name}"],
                                   rtol=2e-3, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(logits), golden["logits"],
                               rtol=2e-3, atol=5e-3)
