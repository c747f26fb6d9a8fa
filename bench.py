"""Headline benchmark: CIFAR-10 SNGAN fused train cycles/sec on one chip.

One cycle = 1 generator step (+ confusion step) + N_CRITIC=5 discriminator
steps at the reference's full size (batch 64, DIM_G=DIM_D=128, z=128,
HINGE loss, projection discriminator, spectral norm) — the unit of the
reference hot loop (``cifar10/gan_resnet.py:919-947``).

Output is ONE self-describing JSON line.  Fields:

- ``value`` / ``unit``: measured fused cycles/sec on this chip — the best
  of the per-dispatch path and the app-default 100-cycle scan-block path
  (both reported under ``extra_metrics``; median of 3 timing windows; the
  value fetch is the end-of-work barrier).
- ``tflops_per_sec`` / ``pct_of_bf16_peak``: the PRIMARY honest headline —
  achieved compute rate (flops/cycle x cycles/sec) and its fraction of one
  v5e chip's 197 TFLOP/s bf16 peak.  flops/cycle is XLA's own count of the
  STATIC-UNROLL variant of the cycle (``flops_source:
  "xla_lowered_unrolled"``): cost_analysis() counts a lax.scan body once
  regardless of trip count, so counting the rolled hot program would drop
  n_critic-1 of the 5 D steps (~2x under-report; that rolled count is
  still surfaced as ``flops_per_cycle_rolled_scan``).  The unrolled
  variant is numerically identical straight-line code
  (tests/test_train.py::test_cifar_static_unroll_matches_rolled) and is
  only lowered, never run.  Fallback: the last known value
  (``flops_source: "analytic_estimate"``).
- ``vs_baseline`` with ``vs_baseline_is_estimate: true``: the reference
  publishes no steps/sec (BASELINE.md), so the denominator is a documented
  ESTIMATE of its single-GPU rate — the TF1.5 feed_dict loop ran 6 session
  calls per cycle with host->device copies of the batch + 5 label tensors
  each; ~1.0 cycles/sec is a generous estimate for the 2018-class single
  GPU the paper used.  BASELINE.md's target is >=5x.
- ``extra_metrics.mnist_*``: the MNIST stack's fused iteration (1 D step +
  2x(G+C) steps, batch 100 — ``mnist/model.py:335-467``), split like the
  CIFAR bench: ``mnist_per_dispatch_iters_per_sec`` (one program dispatch
  per iteration — tunnel-RTT-bound, the number that swung 523->296 between
  rounds 2 and 3) vs ``mnist_scan_block50_iters_per_sec`` (the app's
  default 50-iteration fused ``lax.scan`` path — tracks on-device speed);
  ``mnist_dispatch_rtt_ms`` is the measured difference per iteration.
"""

import json
import time

import numpy as np

REFERENCE_CYCLES_PER_SEC = 1.0  # documented estimate; see module docstring
# Fallback when cost analysis is unavailable: the lowered-HLO count of the
# static-unroll flagship cycle (scan body counted n_critic times; see the
# module docstring — the rolled-program count, 1.9e12, misses 4 of the 5 D
# bodies, and the old 5.4e12 analytic estimate double-counted a generator
# backward inside each D step).
ANALYTIC_FLOPS_PER_CYCLE = 3.64e12
# One v5e chip's bf16 matmul peak; the denominator for pct_of_bf16_peak.
V5E_BF16_PEAK_TFLOPS = 197.0


def _timed_rate(run_one, n_iters=100, windows=3):
    """Median over ``windows`` of ``n_iters`` calls/sec; ``run_one`` must
    return something materializable as the sync barrier."""
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        last = None
        for _ in range(n_iters):
            last = run_one()
        float(last)  # materialize: the only true end-of-work barrier
        rates.append(n_iters / (time.perf_counter() - t0))
    return float(np.median(rates))


def _xla_flops(jitted, *args, compiled=True):
    """Best-effort flops/call from XLA cost analysis; None if unavailable.
    ``compiled=False`` counts the lowered (pre-optimization) HLO — no
    backend compile, and within ~2% of the compiled count for this model
    (flops are shape-determined; it's 'bytes accessed' that needs the
    optimized program)."""
    try:
        lowered = jitted.lower(*args)
        cost = (lowered.compile() if compiled else lowered).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_cifar():
    import jax
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

    it1 = jnp.asarray(1, jnp.int32)
    # True per-cycle flops: count the numerically-identical static-unroll
    # cycle (lowered only, never compiled/run) — the rolled program's count
    # misses n_critic-1 scan-body repetitions (see module docstring).
    unrolled = jax.jit(
        lambda t, r: trainer._cycle(t, d_batches, g_labels, it1, r, None, None,
                                    static_unroll=True)
    )
    flops_per_cycle = _xla_flops(unrolled, ts, jax.random.key(1), compiled=False)
    flops_source = "xla_lowered_unrolled" if flops_per_cycle else "analytic_estimate"
    flops_per_cycle = flops_per_cycle or ANALYTIC_FLOPS_PER_CYCLE
    flops_rolled = _xla_flops(
        trainer._jitted_cycle, ts, d_batches, g_labels, it1, jax.random.key(1), None,
    )

    state = {"ts": ts, "rng": jax.random.key(1), "it": 1}

    def run_one():
        state["rng"], sub = jax.random.split(state["rng"])
        state["ts"], m = trainer.step(state["ts"], d_batches, g_labels, state["it"], sub)
        state["it"] += 1
        return m["d_cost"]

    run_one()  # warmup / compile
    float(state["ts"].step)  # sync before timing
    cycles_per_sec = _timed_rate(run_one)

    # ---- fused scan-block path (the app's default hot loop): K cycles per
    # dispatch over a device-resident dataset — amortizes the per-cycle
    # host->device round trip that dominates through a remote tunnel.
    K = 100  # the app-default scan block (config.py --scan_block)
    rs2 = np.random.RandomState(3)
    n_data = 4096
    dd = {
        "images": rs2.randint(0, 256, (n_data, 3072)).astype(np.uint8),
        "labels": rs2.randint(0, 10, n_data).astype(np.int32),
        "labels_random": rs2.randint(0, 10, n_data).astype(np.int32),
        "labels_biased": rs2.randint(0, 10, n_data).astype(np.int32),
        "labels_inv_weights": rs2.rand(n_data, 10).astype(np.float32),
    }
    tr2 = CifarTrainer(cfg, acfg, tcfg, one_coin_matrix(0.6, 10), mesh=None,
                       compute_dtype=jnp.bfloat16, device_dataset=dd)
    ts2 = tr2.init(jax.random.key(0), batch)
    idx = rs2.randint(0, n_data, (K, tcfg.n_critic, batch)).astype(np.int32)
    g_r = rs2.randint(0, 10, (K, tcfg.gen_bs_multiple * batch)).astype(np.int32)
    g_b = rs2.randint(0, 10, (K, tcfg.gen_bs_multiple * batch)).astype(np.int32)
    st2 = {"ts": ts2, "rng": jax.random.key(4)}

    def run_block():
        st2["rng"], sub = jax.random.split(st2["rng"])
        st2["ts"], ms = tr2.step_scan(st2["ts"], idx, g_r, g_b, sub)
        return ms["d_cost"][-1]

    try:
        run_block()
        float(st2["ts"].step)
        scan_cycles_per_sec = K * _timed_rate(run_block, n_iters=10)
    except Exception as e:  # never lose the primary metric to the extra one
        print(f"# scan-block bench failed: {e}", flush=True)
        scan_cycles_per_sec = 0.0
    return cycles_per_sec, scan_cycles_per_sec, flops_per_cycle, flops_source, flops_rolled


def bench_mnist():
    import jax
    import jax.numpy as jnp

    from rcgan_tpu.algorithms.mnist import MnistAlgoConfig
    from rcgan_tpu.data.confusion import one_coin_matrix
    from rcgan_tpu.models.dcgan import DCGANConfig
    from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig

    batch = 100
    trainer = MnistTrainer(
        DCGANConfig(disc_type="projection"),
        MnistAlgoConfig(algorithm="rcgan", loss_fn="hinge"),
        MnistTrainConfig(),
        one_coin_matrix(0.3, 10),
        mesh=None,
        compute_dtype=jnp.bfloat16,
    )
    rs = np.random.RandomState(1)
    mk_labels = lambda: jnp.asarray(rs.randint(0, 10, (batch,)), jnp.int32)
    b = {
        "images": jnp.asarray(rs.rand(batch, 28, 28, 1), jnp.float32),
        "y_real": mk_labels(),
        "y_gen": mk_labels(),
        "y_fake": mk_labels(),
        "y_real_weights": jnp.asarray(rs.rand(batch, 10), jnp.float32),
    }
    ts = trainer.init(jax.random.key(0), b)
    state = {"ts": ts, "rng": jax.random.key(2)}

    def run_one():
        state["rng"], sub = jax.random.split(state["rng"])
        state["ts"], m = trainer.step(state["ts"], b, sub)
        return m["d_loss"]

    run_one()  # warmup / compile
    float(state["ts"].step)
    per_dispatch = _timed_rate(run_one)

    # ---- fused 50-iteration scan blocks over a device-resident dataset —
    # the app's actual default hot loop (mnist_app.py use_scan path).  The
    # per-dispatch rate above is dominated by the host->device round trip
    # (the step itself is ~1 ms of device work at batch 100); through a
    # remote tunnel that RTT varies run to run, which is exactly the r2->r3
    # 523->296 iters/s swing.  The scan rate amortizes one dispatch over 50
    # iterations and is the number that tracks on-device speed.
    K = 50
    n_data = 4000
    rs2 = np.random.RandomState(7)
    dataset = {
        "images": jnp.asarray(rs2.rand(n_data, 28, 28, 1), jnp.float32),
        "y_real": jnp.asarray(rs2.randint(0, 10, n_data), jnp.int32),
        "y_gen": jnp.asarray(rs2.randint(0, 10, n_data), jnp.int32),
        "y_fake": jnp.asarray(rs2.randint(0, 10, n_data), jnp.int32),
        "y_real_weights": jnp.asarray(rs2.rand(n_data, 10), jnp.float32),
    }
    idx = rs2.randint(0, n_data, (K, batch)).astype(np.int32)
    st2 = {"ts": state["ts"], "rng": jax.random.key(8)}

    def run_block():
        st2["rng"], sub = jax.random.split(st2["rng"])
        st2["ts"], ms = trainer.step_scan(st2["ts"], dataset, idx, sub)
        return ms["d_loss"][-1]

    try:
        run_block()
        float(st2["ts"].step)
        scan_rate = K * _timed_rate(run_block, n_iters=10)
    except Exception as e:
        print(f"# mnist scan-block bench failed: {e}", flush=True)
        scan_rate = 0.0
    # dispatch-RTT attribution: per-dispatch time minus on-device per-iter time
    rtt_ms = (1.0 / per_dispatch - 1.0 / scan_rate) * 1e3 if scan_rate else None
    return per_dispatch, scan_rate, rtt_ms


def _device_reachable(timeout_s=180):
    """Memoized, time-bounded subprocess probe (rcgan_tpu/utils/device_probe
    — the axon remote backend blocks rather than failing when its device
    tunnel is down)."""
    from rcgan_tpu.utils.device_probe import default_backend_reachable

    return default_backend_reachable(timeout_s)


def main():
    if not _device_reachable():
        # emit ONE self-describing json line and exit cleanly instead of
        # hanging the caller until its own timeout
        print(json.dumps({
            "metric": "cifar10_sngan_train_cycles_per_sec_per_chip",
            "value": 0.0,
            "unit": "cycles/s (1 G + 5 D steps, batch 64, dim 128)",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (tunnel down?); no measurement",
        }))
        return

    from rcgan_tpu.utils.compilation_cache import enable as enable_xla_cache

    enable_xla_cache()

    cycles_per_sec, scan_cycles_per_sec, flops_per_cycle, flops_source, flops_rolled = bench_cifar()
    mnist_per_dispatch, mnist_scan, mnist_rtt_ms = bench_mnist()
    best_cycles = max(cycles_per_sec, scan_cycles_per_sec)
    if mnist_rtt_ms is not None:
        print(
            f"# mnist attribution: per-dispatch {mnist_per_dispatch:.1f} it/s vs "
            f"fused-scan {mnist_scan:.1f} it/s -> dispatch RTT ~{mnist_rtt_ms:.2f} ms/iter, "
            f"on-device ~{1e3 / mnist_scan:.2f} ms/iter "
            "(the per-dispatch number is tunnel-RTT-bound and varies between rounds)",
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "cifar10_sngan_train_cycles_per_sec_per_chip",
                "value": round(best_cycles, 4),
                "unit": "cycles/s (1 G + 5 D steps, batch 64, dim 128)",
                "vs_baseline": round(best_cycles / REFERENCE_CYCLES_PER_SEC, 4),
                "vs_baseline_is_estimate": True,
                "baseline_estimate_cycles_per_sec": REFERENCE_CYCLES_PER_SEC,
                "tflops_per_sec": round(best_cycles * flops_per_cycle / 1e12, 2),
                "pct_of_bf16_peak": round(
                    100.0 * best_cycles * flops_per_cycle / 1e12 / V5E_BF16_PEAK_TFLOPS, 1
                ),
                "bf16_peak_tflops": V5E_BF16_PEAK_TFLOPS,
                "flops_per_cycle": flops_per_cycle,
                "flops_source": flops_source,
                "flops_per_cycle_rolled_scan": flops_rolled,
                "extra_metrics": {
                    "per_dispatch_cycles_per_sec": round(cycles_per_sec, 4),
                    "scan_block100_cycles_per_sec": round(scan_cycles_per_sec, 4),
                    # MNIST split (round-4 item 4): the headline MNIST rate is
                    # the fused-scan one — it tracks on-device speed; the
                    # per-dispatch rate is bound by tunnel RTT and explains
                    # the r2->r3 523->296 swing (same program, different RTT).
                    "mnist_fused_iters_per_sec": round(max(mnist_per_dispatch, mnist_scan), 4),
                    "mnist_per_dispatch_iters_per_sec": round(mnist_per_dispatch, 4),
                    "mnist_scan_block50_iters_per_sec": round(mnist_scan, 4),
                    "mnist_dispatch_rtt_ms": (
                        round(mnist_rtt_ms, 3) if mnist_rtt_ms is not None else None
                    ),
                    "mnist_unit": "iters/s (1 D + 2x(G+C) steps, batch 100)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
