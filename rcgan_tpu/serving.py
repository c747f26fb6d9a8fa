"""Serving: load a trained checkpoint and generate class-conditional images
with a pre-compiled sampler — the deployment surface the reference lacks
(its only inference path was re-running the training script with
``--notrain``).

CLI:  python -m rcgan_tpu.serving --model {mnist,cifar} --checkpoint_dir D \
        --labels 0,1,2 --n 100 --out grid.png
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class Sampler:
    """Checkpoint-backed conditional sampler with a fixed compiled batch
    shape (pad-and-slice for ragged requests)."""

    def __init__(self, trainer, ts, model: str, batch: int = 100, z_dim: int = 128):
        self.trainer = trainer
        self.ts = ts
        self.model = model
        self.batch = batch
        self.z_dim = z_dim

    @classmethod
    def from_checkpoint(cls, model: str, checkpoint_dir: str, batch: int = 100, **overrides):
        from rcgan_tpu.data.confusion import one_coin_matrix
        from rcgan_tpu.train.checkpoint import Checkpointer

        if model == "cifar":
            from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
            from rcgan_tpu.models.resnet_gan import ResnetGANConfig
            from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

            cfg = ResnetGANConfig(**overrides)
            trainer = CifarTrainer(cfg, CifarAlgoConfig(algorithm=cfg.algorithm),
                                   CifarTrainConfig(), one_coin_matrix(0.6, 10))
            ts = trainer.init(jax.random.key(0), batch)
            z_dim = cfg.z_dim
        elif model == "mnist":
            from rcgan_tpu.algorithms.mnist import MnistAlgoConfig
            from rcgan_tpu.models.dcgan import DCGANConfig
            from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig

            cfg = DCGANConfig(**overrides)
            trainer = MnistTrainer(cfg, MnistAlgoConfig(algorithm="rcgan"),
                                   MnistTrainConfig(), one_coin_matrix(0.6, 10))
            dummy = {
                "images": jnp.zeros((batch, 28, 28, 1), jnp.float32),
                "y_real": jnp.zeros((batch,), jnp.int32),
                "y_gen": jnp.zeros((batch,), jnp.int32),
                "y_fake": jnp.zeros((batch,), jnp.int32),
                "y_real_weights": jnp.zeros((batch, 10), jnp.float32),
            }
            ts = trainer.init(jax.random.key(0), dummy)
            z_dim = cfg.z_dim
        else:
            raise ValueError(model)

        ckpt = Checkpointer(checkpoint_dir)
        restored = ckpt.restore(ts)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
        return cls(trainer, restored, model, batch, z_dim)

    def sample(self, labels: Sequence[int], rng: Optional[jax.Array] = None) -> np.ndarray:
        """Generate one image per label; returns [N, H, W, C] float in the
        model's output range ([0,1] MNIST sigmoid / [-1,1] CIFAR tanh)."""
        rng = jax.random.key(0) if rng is None else rng
        labels = np.asarray(labels, np.int32)
        outs = []
        for i in range(0, len(labels), self.batch):
            chunk = labels[i : i + self.batch]
            pad = self.batch - len(chunk)
            padded = np.concatenate([chunk, np.zeros(pad, np.int32)]) if pad else chunk
            if self.model == "mnist":
                z = jax.random.uniform(jax.random.fold_in(rng, i), (self.batch, self.z_dim),
                                       jnp.float32, -1.0, 1.0)
                y = jnp.eye(10, dtype=jnp.float32)[padded]
                img = np.asarray(self.trainer.sample(self.ts, z, y))
            else:
                z = jax.random.normal(jax.random.fold_in(rng, i), (self.batch, self.z_dim))
                flat = np.asarray(self.trainer.sample(self.ts, z, jnp.asarray(padded)))
                img = flat.reshape(-1, 32, 32, 3)
            outs.append(img[: len(chunk)])
        return np.concatenate(outs)


def main(argv=None):
    from rcgan_tpu.utils.images import save_images

    p = argparse.ArgumentParser(description="rcgan_tpu sampler")
    p.add_argument("--model", choices=["mnist", "cifar"], required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--labels", default=None, help="comma-separated class ids")
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.labels:
        labels = [int(x) for x in args.labels.split(",")]
    else:
        labels = list(np.arange(args.n) % 10)
    sampler = Sampler.from_checkpoint(args.model, args.checkpoint_dir)
    imgs = sampler.sample(labels, jax.random.key(args.seed))
    if args.model == "cifar":
        imgs = (imgs + 1.0) / 2.0
    n = len(imgs)
    side = int(np.floor(np.sqrt(n)))
    save_images(imgs[: side * side], (side, side), args.out)
    print(f"wrote {args.out} ({side}x{side} grid)")


if __name__ == "__main__":
    main()
