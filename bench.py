"""Headline benchmark: CIFAR-10 SNGAN fused train cycles/sec on one chip.

One cycle = 1 generator step (+ confusion step) + N_CRITIC=5 discriminator
steps at the reference's full size (batch 64, DIM_G=DIM_D=128, z=128,
HINGE loss, projection discriminator, spectral norm) — the unit of the
reference hot loop (``cifar10/gan_resnet.py:919-947``).

``vs_baseline``: the reference publishes no steps/sec (BASELINE.md), so the
denominator is a documented estimate of its single-GPU rate: the TF1.5
feed_dict loop ran 6 session calls per cycle with host→device copies of the
batch + 5 label tensors each; ~1.0 cycles/sec is a generous estimate for the
2018-class single GPU the paper used.  BASELINE.md's target is >=5x, so
``vs_baseline >= 5`` means target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Roofline context: one cycle is ~5.4 TFLOP (G step at gen-batch 128: ~1.9 TF;
5 critic steps: ~0.7 TF each), so ~30 cycles/s ≈ 160 TFLOP/s ≈ 80% of a
v5e chip's 197 TFLOP/s bf16 peak — the fused-cycle design is MXU-bound,
which is where an image GAN should sit.
"""

import json
import time

import numpy as np

REFERENCE_CYCLES_PER_SEC = 1.0  # documented estimate; see module docstring


def main():
    import jax

    from rcgan_tpu.utils.compilation_cache import enable as enable_xla_cache

    enable_xla_cache()
    import jax.numpy as jnp

    from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
    from rcgan_tpu.data.confusion import one_coin_matrix
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

    batch = 64
    cfg = ResnetGANConfig()
    acfg = CifarAlgoConfig(algorithm="rcgan", loss_type="HINGE")
    tcfg = CifarTrainConfig(n_critic=5, gen_bs_multiple=2)
    trainer = CifarTrainer(
        cfg, acfg, tcfg, one_coin_matrix(0.6, 10), mesh=None, compute_dtype=jnp.bfloat16
    )
    ts = trainer.init(jax.random.key(0), batch)

    rs = np.random.RandomState(0)
    d_batches = {
        "images": jnp.asarray(rs.randint(0, 256, (tcfg.n_critic, batch, 3072)), jnp.int32),
        "labels": jnp.asarray(rs.randint(0, 10, (tcfg.n_critic, batch)), jnp.int32),
        "labels_random": jnp.asarray(rs.randint(0, 10, (tcfg.n_critic, batch)), jnp.int32),
        "labels_biased": jnp.asarray(rs.randint(0, 10, (tcfg.n_critic, batch)), jnp.int32),
        "labels_inv_weights": jnp.asarray(rs.rand(tcfg.n_critic, batch, 10), jnp.float32),
    }
    g_labels = {
        "random": jnp.asarray(rs.randint(0, 10, (tcfg.gen_bs_multiple * batch,)), jnp.int32),
        "biased": jnp.asarray(rs.randint(0, 10, (tcfg.gen_bs_multiple * batch,)), jnp.int32),
    }

    rng = jax.random.key(1)
    # warmup / compile (value fetch = hard sync, robust to async-ack backends)
    ts, m = trainer.step(ts, d_batches, g_labels, 1, rng)
    float(m["d_cost"])

    # median of 3 windows: remote-tunnel jitter makes single windows noisy
    n_iters = 100
    rates = []
    it = 2
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            rng, sub = jax.random.split(rng)
            ts, m = trainer.step(ts, d_batches, g_labels, it, sub)
            it += 1
        float(m["d_cost"])  # materialize: the only true end-of-work barrier
        rates.append(n_iters / (time.perf_counter() - t0))

    cycles_per_sec = float(np.median(rates))
    print(
        json.dumps(
            {
                "metric": "cifar10_sngan_train_cycles_per_sec_per_chip",
                "value": round(cycles_per_sec, 4),
                "unit": "cycles/s (1 G + 5 D steps, batch 64, dim 128)",
                "vs_baseline": round(cycles_per_sec / REFERENCE_CYCLES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
