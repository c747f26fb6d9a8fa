"""ctypes bindings for the native host-data engine (data_engine.cpp).

Compiled on first use with g++ (cached as ``libdata_engine.so`` beside the
source); every entry point has a NumPy fallback so the framework still runs
where no compiler exists.  See data_engine.cpp for why this layer is native.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "data_engine.cpp")
_LIB = os.path.join(_HERE, "libdata_engine.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception as e:  # compiler missing / failed: fall back to numpy
        log.warning("native data engine build failed (%s); using NumPy fallback", e)
        return False


def get_lib():
    """Load (building if needed) the shared library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native data engine load failed (%s)", e)
            return None
        u64, i64, i32 = ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32
        pi32 = np.ctypeslib.ndpointer(np.int32, flags="C")
        pi64 = np.ctypeslib.ndpointer(np.int64, flags="C")
        pf64 = np.ctypeslib.ndpointer(np.float64, flags="C")
        pf32 = np.ctypeslib.ndpointer(np.float32, flags="C")
        pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.corrupt_labels.argtypes = [u64, i64, i32, pi32, pf64, pi32]
        lib.make_label_tuple.argtypes = [u64, i64, i32, i32, pi32, pf64, pf64, pi32, pi32, pi32, pf32]
        lib.shuffle_indices.argtypes = [u64, i64, pi64]
        lib.gather_rows.argtypes = [pu8, pi64, i64, i64, pu8]
        lib.gather_i32.argtypes = [pi32, pi64, i64, pi32]
        lib.abi_version.restype = i32
        assert lib.abi_version() == 1
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------------ API
def corrupt_labels(seed: int, labels: np.ndarray, c: np.ndarray) -> np.ndarray:
    labels = np.ascontiguousarray(labels, np.int32)
    c = np.ascontiguousarray(c, np.float64)
    lib = get_lib()
    out = np.empty(len(labels), np.int32)
    if lib is None:
        cdf = np.cumsum(c, axis=-1)
        rs = np.random.RandomState(seed & 0x7FFFFFFF)
        out[:] = (rs.rand(len(labels), 1) > cdf[labels]).sum(axis=-1)
        return out
    lib.corrupt_labels(seed, len(labels), c.shape[0], labels, c, out)
    return out


def make_label_tuple(
    seed: int, y_actual: np.ndarray, c: np.ndarray, c_inv: np.ndarray, real_match: bool = False
):
    y_actual = np.ascontiguousarray(y_actual, np.int32)
    c = np.ascontiguousarray(c, np.float64)
    c_inv = np.ascontiguousarray(c_inv, np.float64)
    n, k = len(y_actual), c.shape[0]
    lib = get_lib()
    if lib is None:
        from rcgan_tpu.data.confusion import corrupt_dataset_numpy

        return corrupt_dataset_numpy(
            np.random.RandomState(seed & 0x7FFFFFFF), y_actual, c, np.asarray(c_inv), real_match
        )
    y_real = np.empty(n, np.int32)
    y_gen = np.empty(n, np.int32)
    y_fake = np.empty(n, np.int32)
    weights = np.empty((n, k), np.float32)
    lib.make_label_tuple(seed, n, k, int(real_match), y_actual, c, c_inv, y_real, y_gen, y_fake, weights)
    return y_real, y_gen, y_fake, weights


def shuffle_indices(seed: int, n: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return np.random.RandomState(seed & 0x7FFFFFFF).permutation(n).astype(np.int64)
    out = np.empty(n, np.int64)
    lib.shuffle_indices(seed, n, out)
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[b] = src[idx[b]] as one contiguous native copy."""
    idx = np.ascontiguousarray(idx, np.int64)
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(src[idx])
    src_c = np.ascontiguousarray(src)
    out = np.empty((len(idx),) + src_c.shape[1:], src_c.dtype)
    row_bytes = src_c.dtype.itemsize * int(np.prod(src_c.shape[1:], initial=1))
    lib.gather_rows(
        src_c.view(np.uint8).reshape(len(src_c), -1),
        idx,
        len(idx),
        row_bytes,
        out.view(np.uint8).reshape(len(idx), -1),
    )
    return out
