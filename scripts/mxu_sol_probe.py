"""MXU speed-of-light probe (round 4, follow-up to the scaling study in
``docs/perf/scaling_r4.json``): the fused GAN cycle saturates at ~108
TFLOP/s (~55% of v5e bf16 peak) no matter the batch.  Is that the
framework, or the XLA kernel envelope for these op shapes?

Measures, through the exact same stack (jit → axon tunnel → chip), the
achieved TFLOP/s of (a) a large square bf16 matmul chain — the MXU
speed-of-light any framework overhead would cap — and (b) 3x3 conv
chains at the flagship shapes (32x32 and the disc trunk's 8x8).  Each
probe is ONE dispatch containing a ``lax.fori_loop`` chain, so tunnel
RTT is amortized to nothing and the number is the kernel, not the wire.

    python scripts/mxu_sol_probe.py --out docs/perf/mxu_sol_r4.json
"""

import argparse
import json
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def timed(fn, arg, windows=5):
    import jax

    out = fn(arg)  # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def matmul_probe(n=8192, iters=30):
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(np.random.RandomState(0).randn(n, n) * (1.0 / np.sqrt(n)), jnp.bfloat16)

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, iters, lambda _, y: jnp.dot(y, w), x)

    x = jnp.asarray(np.random.RandomState(1).randn(n, n), jnp.bfloat16)
    dt = timed(chain, x)
    flops = iters * 2.0 * n**3
    return {"probe": f"matmul {n}x{n}x{n} bf16 x{iters}", "ms": round(dt * 1e3, 2),
            "tflops_per_sec": round(flops / dt / 1e12, 1),
            "pct_bf16_peak": round(100 * flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1)}


def conv_probe(batch, hw, ch, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax

    w = jnp.asarray(
        np.random.RandomState(0).randn(3, 3, ch, ch) * (1.0 / (3 * np.sqrt(ch))), jnp.bfloat16)

    def conv(y):
        return lax.conv_general_dilated(
            y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, iters, lambda _, y: conv(y), x)

    x = jnp.asarray(np.random.RandomState(1).randn(batch, hw, hw, ch), jnp.bfloat16)
    dt = timed(chain, x)
    flops = iters * 2.0 * batch * hw * hw * ch * ch * 9
    return {"probe": f"conv3x3 b{batch} {hw}x{hw} c{ch} bf16 x{iters}",
            "ms": round(dt * 1e3, 2),
            "tflops_per_sec": round(flops / dt / 1e12, 1),
            "pct_bf16_peak": round(100 * flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiny", action="store_true", help="CPU validation shapes")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        rows = [matmul_probe(n=256, iters=4), conv_probe(2, 8, 32, 4)]
    else:
        rows = [
            matmul_probe(n=8192, iters=30),
            conv_probe(64, 32, 128, 50),   # flagship G/D body shape
            conv_probe(256, 32, 128, 20),  # scaled-batch variant
            conv_probe(64, 8, 128, 200),   # disc trunk small-spatial shape
        ]
    for r in rows:
        print(json.dumps(r))
    print(f"platform={jax.devices()[0].platform}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rows, fh, indent=2)
            fh.write("\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
