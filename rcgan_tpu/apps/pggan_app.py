"""Progressive-growing GAN experiment CLI — trains the PGGAN model family
(the reference's vendored-but-dead ``cifar10/common/resnet_block.py:192-349``
surface) through its full resolution schedule, with per-stage conditional
evals against a PINNED classifier at the target resolution.

Default schedule: 4 -> 8 -> 16 -> 32 -> 64 (``--max_stage 4``) on the v2
synthetic class-conditional data rendered natively at ``--size`` (the
generator parameterizes resolution; VERDICT r2 item 8).  Per stage:
transition (fade-in alpha 0 -> 1) then stabilization; at each phase end a
sample grid is saved and gen-label-acc is scored by upsampling the stage
output to the pinned classifier's resolution.

Usage:  python -m rcgan_tpu.apps.pggan_app --run_dir runs/pggan64 \
            --size 64 --max_stage 4 --trans_iters 1500 --stab_iters 1500
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--size", type=int, default=64, help="data resolution (4*2^max_stage)")
    p.add_argument("--max_stage", type=int, default=4)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--trans_iters", type=int, default=1500)
    p.add_argument("--stab_iters", type=int, default=1500)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--train_size", type=int, default=20000)
    p.add_argument("--eval_samples", type=int, default=2000)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--classifier_dir", default=None,
                   help="where the pinned eval classifier is cached; default "
                        "is the PARENT of --run_dir so repeat runs on the "
                        "same data (sweeps, debug reruns) share one "
                        "classifier instead of retraining it on-chip — the "
                        "filename is keyed by size/seed/train_size, so "
                        "different data settings never collide")
    p.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True,
                   help="auto-resume from the run dir's latest phase "
                        "checkpoint (the reference's latest-checkpoint "
                        "behavior, gan_resnet.py:905-914)")
    p.add_argument("--conditional", action=argparse.BooleanOptionalAction, default=True,
                   help="projection-conditional critic (without it the "
                        "label-conditioned generator has no conditioning "
                        "signal and gen-label-acc stays at chance)")
    return p.parse_args(argv)


def main(argv=None):
    from rcgan_tpu.data.cifar10 import synthetic_cifar
    from rcgan_tpu.evals.classifier import (
        cifar_classifier,
        generated_label_accuracy,
        train_pinned,
    )
    from rcgan_tpu.models.pggan import PGGANConfig
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.train.pggan_loop import PGGANTrainConfig, PGGANTrainer
    from rcgan_tpu.utils import run_dir as run_dir_lib
    from rcgan_tpu.utils.images import image_manifold_size, save_images
    from rcgan_tpu.utils.metrics import MetricLogger

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    assert args.size == 4 * (2 ** args.max_stage), \
        f"--size must be 4*2^max_stage, got {args.size} vs stage {args.max_stage}"
    os.makedirs(args.run_dir, exist_ok=True)
    run_dir_lib.record_setting(args.run_dir, vars(args))

    # ---- data: v2 synthetic family rendered natively at the target size
    x_u8, labels = synthetic_cifar(args.train_size, seed=args.seed, size=args.size)
    x = x_u8.astype(np.float32).reshape(-1, 3, args.size, args.size).transpose(0, 2, 3, 1)
    x = 2.0 * (x / 255.0 - 0.5)
    labels = labels.astype(np.int32)
    xd_u8, yd = synthetic_cifar(5000, seed=args.seed, image_seed=args.seed + 7,
                                size=args.size)
    xd = xd_u8.astype(np.float32).reshape(-1, 3, args.size, args.size).transpose(0, 2, 3, 1)
    xd = 2.0 * (xd / 255.0 - 0.5)

    # ---- pinned eval classifier at the TARGET resolution (shared across
    # runs on identical data; train_pinned re-verifies the pin on load)
    cls_dir = args.classifier_dir or os.path.dirname(os.path.abspath(args.run_dir))
    cls_name = f"eval_classifier_{args.size}_s{args.seed}_n{args.train_size}.pkl"
    cls = cifar_classifier(img_size=args.size)
    pin = train_pinned(
        cls, os.path.join(cls_dir, cls_name),
        x, labels, xd, yd.astype(np.int32), epochs=3, rng=jax.random.key(123),
    )
    log.info("pinned eval classifier (%dx%d) clean accuracy: %.4f", args.size,
             args.size, pin)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    cfg = PGGANConfig(z_dim=args.z_dim, dim=args.dim, max_stage=args.max_stage,
                      conditional=args.conditional)
    base = ResnetGANConfig(dim_g=args.dim, dim_d=args.dim, z_dim=args.z_dim)
    tcfg = PGGANTrainConfig(lr=args.lr, trans_iters=args.trans_iters,
                            stab_iters=args.stab_iters)
    tr = PGGANTrainer(cfg, base, tcfg, compute_dtype=dtype)
    ts = tr.init(jax.random.key(args.seed), args.batch_size)

    from rcgan_tpu.train.checkpoint import Checkpointer

    ckpt = Checkpointer(os.path.join(args.run_dir, "ckpt"))
    restored = ckpt.restore(ts) if args.resume else None
    if restored is not None:
        ts = restored
        log.info("resuming from phase checkpoint at step %d (the schedule "
                 "is deterministic; completed phases are skipped)", int(ts.step))

    metrics = MetricLogger()
    rng = jax.random.key(args.seed + 1)
    x_dev = jnp.asarray(x)
    labels_dev = jnp.asarray(labels)

    def data_fn(it):
        # keyed by the iteration index (not a shared stream) so a resumed
        # run sees bit-identical batches for its remaining iterations
        idx = np.random.RandomState(args.seed + 2 + it).randint(
            len(x), size=args.batch_size)
        return {"x": jnp.take(x_dev, jnp.asarray(idx), axis=0),
                "labels": jnp.take(labels_dev, jnp.asarray(idx), axis=0)}

    acc_path = os.path.join(args.run_dir, "stage_accuracy.json")
    eval_rows = []
    if restored is not None and os.path.exists(acc_path):
        # adopt the pre-crash process's rows for the phases this process
        # skips (rows past the restored step can't exist: the phase
        # checkpoint is saved after the eval row is flushed)
        with open(acc_path) as f:
            eval_rows = [r for r in json.load(f) if r["iter"] <= int(ts.step)]

    def flush_rows():
        with open(acc_path, "w") as f:
            json.dump(eval_rows, f, indent=2)

    def eval_stage(stage, trans, it, ts):
        """Per-stage conditional eval: sample at the stage resolution,
        upsample to the classifier resolution, score gen-label-acc."""
        n = args.eval_samples
        accs = []
        per = args.batch_size
        for i in range(0, n, per):
            y = np.arange(i, i + per) % 10
            z = jnp.asarray(np.random.RandomState(9000 + i).randn(per, cfg.z_dim),
                            jnp.float32)
            s = tr.sample(ts, z, jnp.asarray(y, jnp.int32), stage=stage)
            s = jax.image.resize(
                s.astype(jnp.float32), (per, args.size, args.size, 3), "nearest")
            accs.append(generated_label_accuracy(cls, np.asarray(s), y))
        acc = float(np.mean(accs))
        row = {"stage": stage, "res": 4 * 2 ** stage, "trans": trans, "iter": it,
               "gen_label_acc": acc, "classifier_pin": pin}
        eval_rows.append(row)
        flush_rows()  # per-phase, so a crash never loses completed rows
        metrics.plot_at(f"gen_label_acc_stage{stage}", acc, it)
        log.info("stage %d (%dx%d) trans=%s iter=%d gen_label_acc=%.4f",
                 stage, row["res"], row["res"], trans, it, acc)
        # sample grid at the native stage resolution
        z = jnp.asarray(np.random.RandomState(77).randn(100, cfg.z_dim), jnp.float32)
        y = jnp.asarray(np.arange(100) % 10, jnp.int32)
        grid = np.asarray(tr.sample(ts, z, y, stage=stage)).astype(np.float32)
        save_images((grid + 1.0) / 2.0, image_manifold_size(100),
                    os.path.join(args.run_dir, f"samples_stage{stage}_"
                                 f"{'trans' if trans else 'stab'}.png"))

    t0 = time.time()

    def log_fn(stage, trans, it, m, live_ts):
        log.info("phase done: stage=%d trans=%s iter=%d d_cost=%.4f g_cost=%.4f "
                 "elapsed=%.1fs", stage, trans, it, m["d_cost"], m["g_cost"],
                 time.time() - t0)
        metrics.plot_at("d_cost", m["d_cost"], it)
        metrics.plot_at("g_cost", m["g_cost"], it)
        eval_stage(stage, trans, it, live_ts)
        metrics.dir_flush(args.run_dir)

    ts = tr.train_progressive(ts, data_fn, rng, log_fn=log_fn, ckpt=ckpt)
    ckpt.close()
    flush_rows()
    log.info("final per-stage accuracy table: %s",
             json.dumps(eval_rows[-args.max_stage:]))
    return ts, eval_rows


if __name__ == "__main__":
    main()
