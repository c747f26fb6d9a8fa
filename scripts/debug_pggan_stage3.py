"""Diagnose the progressive-GAN stage-3 generator collapse: run the
schedule to stage 3 (size 32) with intra-phase logging of costs and the
parameter/output norms of the stage-3 blocks, to localize when and where
the blow-up starts.

    python scripts/debug_pggan_stage3.py [--iters 600] [--dim 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--every", type=int, default=50)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rcgan_tpu.data.cifar10 import synthetic_cifar
    from rcgan_tpu.models.pggan import PGGANConfig
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.train.pggan_loop import PGGANTrainConfig, PGGANTrainer

    size = 32
    x_u8, labels = synthetic_cifar(5000, seed=0, size=size)
    x = x_u8.astype(np.float32).reshape(-1, 3, size, size).transpose(0, 2, 3, 1)
    x = 2.0 * (x / 255.0 - 0.5)
    labels = labels.astype(np.int32)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    cfg = PGGANConfig(z_dim=128, dim=args.dim, max_stage=3)
    base = ResnetGANConfig(dim_g=args.dim, dim_d=args.dim, z_dim=128)
    tcfg = PGGANTrainConfig(trans_iters=args.iters, stab_iters=args.iters)
    tr = PGGANTrainer(cfg, base, tcfg, compute_dtype=dtype)
    ts = tr.init(jax.random.key(0), args.batch_size)

    x_dev = jnp.asarray(x)
    labels_dev = jnp.asarray(labels)
    rs = np.random.RandomState(2)

    def data_fn(it):
        idx = rs.randint(len(x), size=args.batch_size)
        return {"x": jnp.take(x_dev, jnp.asarray(idx), axis=0),
                "labels": jnp.take(labels_dev, jnp.asarray(idx), axis=0)}

    def pnorm(group, prefix):
        tot = 0.0
        for k, leaves in group.items():
            if k.startswith(prefix):
                for v in jax.tree_util.tree_leaves(leaves):
                    tot += float(jnp.sum(jnp.square(jnp.asarray(v, jnp.float32))))
        return tot ** 0.5

    def sample_absmax(ts, stage):
        z = jnp.asarray(np.random.RandomState(5).randn(16, cfg.z_dim), jnp.float32)
        y = jnp.asarray(np.arange(16) % 10, jnp.int32)
        s = tr.sample(ts, z, y, stage=stage)
        s = np.asarray(s, np.float32)
        return float(np.abs(s).mean()), float(np.abs(s).max())

    def progress(stage, trans, it, alpha, m, ts):
        g = ts.groups["gen"]
        d = ts.groups["disc"]
        amean, amax = sample_absmax(ts, stage)
        print(f"s{stage} trans={int(trans)} it={it:5d} a={alpha:.2f} "
              f"d={m['d_cost']:9.3f} g={m['g_cost']:9.3f} "
              f"|ToRGB.{stage}|={pnorm(g, f'PG.G.ToRGB.{stage}'):8.2f} "
              f"|G.Block.{stage}|={pnorm(g, f'PG.G.Block.{stage}'):8.2f} "
              f"|G.Input|={pnorm(g, 'PG.G.Input'):8.2f} "
              f"|D.FromRGB.{stage}|={pnorm(d, f'PG.D.FromRGB.{stage}'):8.2f} "
              f"samp|mean/max|={amean:.3f}/{amax:.3f}", flush=True)

    tr.train_progressive(ts, data_fn, jax.random.key(1),
                         log_fn=lambda *a: None,
                         progress_every=args.every, progress_fn=progress)


if __name__ == "__main__":
    main()
