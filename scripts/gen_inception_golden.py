"""Regenerate the Inception-v3 golden pin (tests/golden/inception_v3_golden.npz).

Pins the full 94-layer graph semantics (VERDICT r2 item 3): fixed
``random_weights(0)`` + fixed inputs → per-block output shapes and
mean/std checksums + final logits, computed in f32 on CPU with
``highest`` matmul precision.  Any stride/padding/branch-order change in
any block shifts that block's checksum (and everything downstream) far
beyond the test tolerance.

Run from the repo root:  python scripts/gen_inception_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from rcgan_tpu.evals import inception_v3


def main():
    params = {k: np.asarray(v) for k, v in inception_v3.random_weights(0).items()}
    rs = np.random.RandomState(1)
    x = rs.uniform(-2.0, 2.0, (2, 299, 299, 3)).astype(np.float32)

    logits, blocks = jax.jit(inception_v3.inception_v3_blocks)(params, x)
    # the input is regenerated in the test from the same fixed RandomState(1)
    # draw (stable across numpy versions), so only outputs are stored
    out = {"logits": np.asarray(logits)}
    for name, v in blocks.items():
        v = np.asarray(v)
        out[f"shape.{name}"] = np.asarray(v.shape, np.int64)
        out[f"mean.{name}"] = np.asarray(v.mean(), np.float64)
        out[f"std.{name}"] = np.asarray(v.std(), np.float64)
    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(dest, exist_ok=True)
    path = os.path.join(dest, "inception_v3_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: logits[0,:3]={np.asarray(logits)[0, :3]}")


if __name__ == "__main__":
    main()
