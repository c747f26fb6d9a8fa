"""A/B the fused Pallas 3x3 conv kernel vs XLA's conv on the real chip.

Measures, for each flagship shape (b, h, w, 128->128, bf16):
  * forward-only: conv3x3_fused vs lax.conv_general_dilated
  * fwd+bwd:      sum-of-sin loss grads through each
and then the end-to-end flagship train cycle with RCGAN_PALLAS_CONV3X3=0/1
(the number that decides the routing default — VERDICT r4 item 3).

Writes docs/perf/conv_kernel_ab_r5.json and prints a table.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=50, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from rcgan_tpu.ops.pallas.conv_kernel import conv3x3_fused

    assert jax.devices()[0].platform == "tpu", "run on the real chip"
    rows = []
    # the flagship mix: D blocks at 32^2/16^2/8^2 batch 64, G blocks at
    # 8^2..32^2 gen-batch 128
    for b, h, w in [(64, 32, 32), (64, 16, 16), (64, 8, 8),
                    (128, 32, 32), (128, 16, 16), (128, 8, 8)]:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, h, w, 128), jnp.bfloat16)
        wgt = jnp.asarray(0.1 * rs.randn(3, 3, 128, 128), jnp.bfloat16)

        xla = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        pal = jax.jit(conv3x3_fused)

        t_xla = timed(xla, x, wgt)
        t_pal = timed(pal, x, wgt)

        def loss(conv, x, w):
            return jnp.sum(jnp.sin(conv(x, w).astype(jnp.float32)))

        g_xla = jax.jit(jax.grad(functools.partial(loss, lambda a, c: jax.lax.conv_general_dilated(
            a, c, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))), argnums=(0, 1)))
        g_pal = jax.jit(jax.grad(functools.partial(loss, conv3x3_fused), argnums=(0, 1)))
        tg_xla = timed(g_xla, x, wgt)
        tg_pal = timed(g_pal, x, wgt)

        flops = 2 * b * h * w * 9 * 128 * 128
        row = {
            "shape": f"b{b} {h}x{w} 128->128 bf16",
            "fwd_xla_us": round(t_xla * 1e6, 1),
            "fwd_pallas_us": round(t_pal * 1e6, 1),
            "fwd_speedup": round(t_xla / t_pal, 3),
            "fwd_xla_tflops": round(flops / t_xla / 1e12, 1),
            "fwd_pallas_tflops": round(flops / t_pal / 1e12, 1),
            "fwdbwd_xla_us": round(tg_xla * 1e6, 1),
            "fwdbwd_pallas_us": round(tg_pal * 1e6, 1),
            "fwdbwd_speedup": round(tg_xla / tg_pal, 3),
        }
        rows.append(row)
        print(row, flush=True)

    # end-to-end flagship cycle A/B (the routing decider)
    from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
    from rcgan_tpu.data.confusion import one_coin_matrix
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

    def cycle_rate(force: str, moment_dtype=None):
        os.environ["RCGAN_PALLAS_CONV3X3"] = force
        batch = 64
        tcfg = CifarTrainConfig(n_critic=5, gen_bs_multiple=2, moment_dtype=moment_dtype)
        trainer = CifarTrainer(
            ResnetGANConfig(), CifarAlgoConfig(algorithm="rcgan", loss_type="HINGE"),
            tcfg, one_coin_matrix(0.6, 10), mesh=None, compute_dtype=jnp.bfloat16,
        )
        ts = trainer.init(jax.random.key(0), batch)
        rs = np.random.RandomState(0)
        d_batches = {
            "images": jnp.asarray(rs.randint(0, 256, (5, batch, 3072)), jnp.int32),
            "labels": jnp.asarray(rs.randint(0, 10, (5, batch)), jnp.int32),
            "labels_random": jnp.asarray(rs.randint(0, 10, (5, batch)), jnp.int32),
            "labels_biased": jnp.asarray(rs.randint(0, 10, (5, batch)), jnp.int32),
            "labels_inv_weights": jnp.asarray(rs.rand(5, batch, 10), jnp.float32),
        }
        g_labels = {
            "random": jnp.asarray(rs.randint(0, 10, (2 * batch,)), jnp.int32),
            "biased": jnp.asarray(rs.randint(0, 10, (2 * batch,)), jnp.int32),
        }
        st = {"ts": ts, "rng": jax.random.key(1), "it": 1}

        def run_one():
            st["rng"], sub = jax.random.split(st["rng"])
            st["ts"], m = trainer.step(st["ts"], d_batches, g_labels, st["it"], sub)
            st["it"] += 1
            return m["d_cost"]

        run_one()
        float(st["ts"].step)
        t0 = time.perf_counter()
        n = 100
        last = None
        for _ in range(n):
            last = run_one()
        float(last)
        return n / (time.perf_counter() - t0)

    r_off = cycle_rate("0")
    r_on = cycle_rate("1")
    # the second VERDICT-item-3 lever: bf16 Adam-moment storage (halves the
    # optimizer tail's HBM traffic; quality caveat documented in state.py)
    r_bf16m = cycle_rate("0", moment_dtype="bfloat16")
    os.environ.pop("RCGAN_PALLAS_CONV3X3", None)
    summary = {
        "cycle_rate_conv_xla": round(r_off, 3),
        "cycle_rate_conv_pallas": round(r_on, 3),
        "cycle_speedup": round(r_on / r_off, 4),
        "cycle_rate_bf16_moments": round(r_bf16m, 3),
        "bf16_moments_speedup": round(r_bf16m / r_off, 4),
        "per_shape": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "per_shape"}, indent=2))
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "perf",
                       "conv_kernel_ab_r5.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
