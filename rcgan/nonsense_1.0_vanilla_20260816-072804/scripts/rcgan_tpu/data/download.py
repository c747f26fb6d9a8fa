"""Dataset bootstrap (reference: ``download.py:20-74``): fetch MNIST idx
files and the CIFAR-10 python pickle into ``data_dir``.  Network access is
unavailable in some deployments; every loader falls back to synthetic data
when files are missing (``allow_synthetic``)."""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import urllib.request

MNIST_BASE = "https://storage.googleapis.com/cvdf-datasets/mnist/"
MNIST_FILES = [
    "train-images-idx3-ubyte.gz",
    "train-labels-idx1-ubyte.gz",
    "t10k-images-idx3-ubyte.gz",
    "t10k-labels-idx1-ubyte.gz",
]
CIFAR_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"


def download_mnist(data_dir: str):
    out = os.path.join(data_dir, "mnist")
    os.makedirs(out, exist_ok=True)
    for f in MNIST_FILES:
        gz = os.path.join(out, f)
        raw = gz[:-3]
        if os.path.exists(raw):
            continue
        urllib.request.urlretrieve(MNIST_BASE + f, gz)
        with gzip.open(gz, "rb") as src, open(raw, "wb") as dst:
            shutil.copyfileobj(src, dst)
        os.remove(gz)


def download_cifar10(data_dir: str):
    os.makedirs(data_dir, exist_ok=True)
    tgz = os.path.join(data_dir, "cifar-10-python.tar.gz")
    if not os.path.exists(os.path.join(data_dir, "cifar-10-batches-py")):
        urllib.request.urlretrieve(CIFAR_URL, tgz)
        with tarfile.open(tgz) as tf:
            tf.extractall(data_dir)
        os.remove(tgz)


if __name__ == "__main__":
    import sys

    target = sys.argv[1] if len(sys.argv) > 1 else "all"
    root = sys.argv[2] if len(sys.argv) > 2 else "./data"
    if target in ("mnist", "all"):
        download_mnist(root)
    if target in ("cifar10", "all"):
        download_cifar10(root)
