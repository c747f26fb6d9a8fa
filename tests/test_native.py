"""Native host-data engine vs NumPy oracles (statistical + exact)."""

import numpy as np
import pytest

from rcgan_tpu import native
from rcgan_tpu.data.confusion import build_confusion


requires_native = pytest.mark.skipif(not native.available(), reason="no g++ / build failed")


@requires_native
def test_corrupt_labels_statistics():
    c, _ = build_confusion(0.7, 10)
    labels = np.zeros(200_000, np.int32)
    out = native.corrupt_labels(1234, labels, c)
    freq = np.bincount(out, minlength=10) / len(out)
    np.testing.assert_allclose(freq, c[0], atol=5e-3)


@requires_native
def test_make_label_tuple_statistics_and_weights():
    c, c_inv = build_confusion(0.5, 10)
    rs = np.random.RandomState(0)
    y = rs.randint(10, size=100_000).astype(np.int32)
    y_real, y_gen, y_fake, w = native.make_label_tuple(99, y, c, c_inv)
    np.testing.assert_allclose((y_real == y).mean(), 0.5, atol=7e-3)
    np.testing.assert_allclose(np.bincount(y_gen, minlength=10) / len(y), 0.1, atol=7e-3)
    np.testing.assert_allclose((y_fake == y_gen).mean(), 0.5, atol=7e-3)
    np.testing.assert_allclose(w[123], c_inv[y_real[123]], rtol=1e-6)

    # real_match: y_gen == y_real
    y_real2, y_gen2, _, _ = native.make_label_tuple(7, y[:1000], c, c_inv, real_match=True)
    np.testing.assert_array_equal(y_real2, y_gen2)


@requires_native
def test_shuffle_is_permutation_and_seeded():
    a = native.shuffle_indices(5, 10_000)
    b = native.shuffle_indices(5, 10_000)
    c = native.shuffle_indices(6, 10_000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(10_000))


@requires_native
def test_gather_rows_matches_fancy_indexing():
    rs = np.random.RandomState(0)
    for dtype in (np.uint8, np.float32, np.int32):
        src = (rs.rand(1000, 17) * 100).astype(dtype)
        idx = rs.randint(0, 1000, 256).astype(np.int64)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_numpy_fallback_paths():
    """Fallbacks must work even when the native lib is present (direct call)."""
    c, c_inv = build_confusion(0.6, 10)
    rs_labels = np.random.RandomState(1).randint(10, size=5000).astype(np.int32)
    # exercise fallback by calling the numpy implementations directly
    from rcgan_tpu.data.confusion import corrupt_dataset_numpy

    y_real, y_gen, y_fake, w = corrupt_dataset_numpy(np.random.RandomState(2), rs_labels, c, c_inv)
    assert y_real.shape == rs_labels.shape and w.shape == (5000, 10)
