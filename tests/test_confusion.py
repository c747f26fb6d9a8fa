"""Confusion-matrix construction and corruption-statistics tests
(the oracles SURVEY §4 identifies: closed-form C/C^-1, empirical
corruption frequencies)."""

import numpy as np

import jax
import jax.numpy as jnp

from rcgan_tpu.data.confusion import (
    build_confusion,
    class_dependent_matrix,
    corrupt_dataset_numpy,
    corrupt_labels,
    make_label_tuple,
    one_coin_matrix,
)


def test_one_coin_matrix_closed_form():
    c = one_coin_matrix(0.6, 10)
    np.testing.assert_allclose(np.diag(c), 0.6)
    off = c[~np.eye(10, dtype=bool)]
    np.testing.assert_allclose(off, (1 - 0.6) / 9)
    np.testing.assert_allclose(c.sum(axis=1), 1.0)


def test_class_dependent_matrix_rows_sum_to_one():
    c = class_dependent_matrix(0.5, 10)
    np.testing.assert_allclose(c.sum(axis=1), 1.0)
    # diagonals follow linspace(0.15, -0.15+2*alpha) over default 50 points
    expect = np.linspace(0.15, -0.15 + 1.0)[:10]
    np.testing.assert_allclose(np.diag(c), expect)


def test_inverse_matches_numpy():
    c, c_inv = build_confusion(0.3, 10)
    np.testing.assert_allclose(c @ c_inv, np.eye(10), atol=1e-10)


def test_corrupt_labels_empirical_frequencies():
    c = one_coin_matrix(0.7, 10)
    n = 200_000
    labels = jnp.zeros((n,), jnp.int32)  # all class 0
    out = corrupt_labels(jax.random.key(0), labels, jnp.asarray(c))
    freq = np.bincount(np.asarray(out), minlength=10) / n
    np.testing.assert_allclose(freq, c[0], atol=5e-3)


def test_corrupt_dataset_numpy_statistics():
    c, c_inv = build_confusion(0.5, 10)
    rs = np.random.RandomState(0)
    y = rs.randint(10, size=100_000)
    y_real, y_gen, y_fake, w = corrupt_dataset_numpy(np.random.RandomState(1), y, c, c_inv)
    keep = (y_real == y).mean()
    np.testing.assert_allclose(keep, 0.5, atol=6e-3)
    # weights are the C^-1 row selected by the observed label
    np.testing.assert_allclose(w[17], c_inv[y_real[17]])
    # y_gen uniform
    np.testing.assert_allclose(np.bincount(y_gen, minlength=10) / len(y_gen), 0.1, atol=6e-3)
    # y_fake ~ C[y_gen]
    np.testing.assert_allclose((y_fake == y_gen).mean(), 0.5, atol=6e-3)


def test_make_label_tuple_real_match():
    c, c_inv = build_confusion(0.4, 10)
    y = jnp.arange(1000) % 10
    y_real, y_gen, y_fake, w = make_label_tuple(
        jax.random.key(0), y, jnp.asarray(c), jnp.asarray(c_inv), real_match=True
    )
    np.testing.assert_array_equal(np.asarray(y_gen), np.asarray(y_real))
    assert w.shape == (1000, 10)


def test_recovery_report_exact_and_permuted():
    from rcgan_tpu.evals.confusion_recovery import recovery_report

    c = one_coin_matrix(0.6, 10)
    rep = recovery_report(c, c)
    assert rep["raw_tv"] == 0.0 and rep["perm_tv"] == 0.0
    assert rep["perm_is_identity"]
    np.testing.assert_allclose(rep["mean_diag"], 0.6)

    # a row-permuted learned C (generator swapped classes): raw TV is large,
    # permutation-corrected TV is zero and the permutation is recovered
    perm = np.roll(np.arange(10), 3)
    learned = c[perm]
    rep = recovery_report(learned, c)
    assert rep["perm_tv"] < 1e-12
    assert rep["raw_tv"] > 0.4
    assert not rep["perm_is_identity"]
    np.testing.assert_array_equal(rep["perm"], perm)


def test_recovery_report_noisy_estimate():
    from rcgan_tpu.evals.confusion_recovery import recovery_report

    c = one_coin_matrix(0.6, 10)
    rs = np.random.RandomState(0)
    learned = c + 0.01 * rs.rand(10, 10)
    learned /= learned.sum(-1, keepdims=True)
    rep = recovery_report(learned, c)
    # small perturbation: identity is the best assignment, small TV
    assert rep["perm_is_identity"]
    assert 0.0 < rep["perm_tv"] < 0.05
    assert rep["perm_tv"] <= rep["raw_tv"] + 1e-12
