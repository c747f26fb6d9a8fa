"""Serving: load a trained checkpoint and generate class-conditional images
with pre-compiled samplers — the deployment surface the reference lacks
(its only inference path was re-running the training script with
``--notrain``).

Production hardening on top of the checkpoint-backed sampler:

- **Batch-size buckets**: samplers are compiled once per bucket size and
  ragged requests route to the smallest covering bucket (pad-and-slice),
  so a 3-image request does not pay a 100-image generator pass.
- **AOT export** (``jax.export``): the sampler (weights baked in) can be
  serialized to a StableHLO artifact and reloaded WITHOUT the framework,
  checkpoint, or retracing — process restarts skip compile entirely.
- **HTTP endpoint** (stdlib-only): ``GET /sample?labels=1,2,3&seed=0``
  returns a PNG grid; ``GET /healthz`` for probes.

CLI:  python -m rcgan_tpu.serving --model {mnist,cifar} --checkpoint_dir D \
        [--labels 0,1,2 --n 100 --out grid.png] [--export path.bin]
        [--serve --port 8321]
"""

from __future__ import annotations

import argparse
import io
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_BUCKETS = (1, 8, 32, 100)


class Sampler:
    """Checkpoint-backed conditional sampler with bucketed compiled batch
    shapes (pad-and-slice for ragged requests)."""

    def __init__(self, trainer, ts, model: str, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 z_dim: int = 128):
        self.trainer = trainer
        self.ts = ts
        self.model = model
        self.buckets = tuple(sorted(buckets))
        self.z_dim = z_dim

    @classmethod
    def from_checkpoint(cls, model: str, checkpoint_dir: str,
                        buckets: Sequence[int] = DEFAULT_BUCKETS, **overrides):
        from rcgan_tpu.data.confusion import one_coin_matrix
        from rcgan_tpu.train.checkpoint import Checkpointer

        batch = max(buckets)
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
        return cls(trainer, restored, model, buckets, z_dim)

    # ----------------------------------------------------------- internals
    def _run_batch(self, padded: np.ndarray, key: jax.Array) -> np.ndarray:
        """One compiled pass at len(padded) (a bucket size)."""
        b = len(padded)
        if self.model == "mnist":
            z = jax.random.uniform(key, (b, self.z_dim), jnp.float32, -1.0, 1.0)
            y = jnp.eye(10, dtype=jnp.float32)[padded]
            return np.asarray(self.trainer.sample(self.ts, z, y))
        z = jax.random.normal(key, (b, self.z_dim))
        flat = np.asarray(self.trainer.sample(self.ts, z, jnp.asarray(padded)))
        return flat.reshape(-1, 32, 32, 3)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def sample(self, labels: Sequence[int], rng: Optional[jax.Array] = None) -> np.ndarray:
        """Generate one image per label; returns [N, H, W, C] float in the
        model's output range ([0,1] MNIST sigmoid / [-1,1] CIFAR tanh).
        Requests larger than the biggest bucket stream through it; the
        remainder routes to the smallest covering bucket."""
        rng = jax.random.key(0) if rng is None else rng
        labels = np.asarray(labels, np.int32)
        big = self.buckets[-1]
        outs = []
        i = 0
        while i < len(labels):
            chunk = labels[i : i + big]
            bucket = self._bucket_for(len(chunk))
            pad = bucket - len(chunk)
            padded = np.concatenate([chunk, np.zeros(pad, np.int32)]) if pad else chunk
            img = self._run_batch(padded, jax.random.fold_in(rng, i))
            outs.append(img[: len(chunk)])
            i += len(chunk)
        return np.concatenate(outs)

    # ---------------------------------------------------------- AOT export
    def export_sampler(self, path: str, bucket: Optional[int] = None):
        """Serialize the sampler at one bucket size to a ``jax.export``
        StableHLO artifact with the weights baked in.  The artifact is
        self-contained: reload with :func:`load_exported` — no framework
        model code, checkpoint, or retrace needed."""
        from jax import export as jexport

        b = bucket or self.buckets[-1]
        ts = self.ts

        if self.model == "mnist":
            def fn(z, labels):
                y = jnp.eye(10, dtype=jnp.float32)[labels]
                return self.trainer.sample(ts, z, y)
        else:
            def fn(z, labels):
                flat = self.trainer.sample(ts, z, labels)
                return flat.reshape(-1, 32, 32, 3)

        exp = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((b, self.z_dim), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        with open(path, "wb") as f:
            f.write(exp.serialize())
        return b


def load_exported(path: str):
    """Reload an exported sampler: returns ``fn(z [B, zdim] f32, labels [B]
    i32) -> images`` running the baked-in weights."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return lambda z, labels: exp.call(jnp.asarray(z, jnp.float32), jnp.asarray(labels, jnp.int32))


# ------------------------------------------------------------------ HTTP
def _to_png_grid(imgs: np.ndarray) -> bytes:
    from rcgan_tpu.utils.images import merge

    n = len(imgs)
    side = max(1, int(np.floor(np.sqrt(n))))
    grid = merge(imgs[: side * side], (side, side))
    if grid.ndim == 3 and grid.shape[-1] == 1:
        grid = grid[..., 0]
    from PIL import Image

    arr = (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def make_server(sampler: Sampler, port: int = 8321, host: str = "127.0.0.1"):
    """stdlib HTTP server: GET /healthz; GET /sample?labels=1,2,3&seed=0
    (or ?n=16 for random labels) -> image/png grid."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                return self._send(200, b"ok")
            if url.path != "/sample":
                return self._send(404, b"not found")
            q = parse_qs(url.query)
            try:
                if "labels" in q:
                    labels = [int(x) for x in q["labels"][0].split(",")]
                else:
                    n = int(q.get("n", ["16"])[0])
                    labels = list(np.arange(n) % 10)
                seed = int(q.get("seed", ["0"])[0])
            except ValueError:
                return self._send(400, b"bad labels/seed")
            imgs = sampler.sample(labels, jax.random.key(seed))
            if sampler.model == "cifar":
                imgs = (imgs + 1.0) / 2.0
            return self._send(200, _to_png_grid(imgs), "image/png")

    return HTTPServer((host, port), Handler)


def main(argv=None):
    from rcgan_tpu.utils.images import save_images

    p = argparse.ArgumentParser(description="rcgan_tpu sampler")
    p.add_argument("--model", choices=["mnist", "cifar"], required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--labels", default=None, help="comma-separated class ids")
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--out", default="samples.png")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--export", default=None, help="write an AOT jax.export artifact here")
    p.add_argument("--serve", action="store_true", help="run the HTTP endpoint")
    p.add_argument("--port", type=int, default=8321)
    args = p.parse_args(argv)

    sampler = Sampler.from_checkpoint(args.model, args.checkpoint_dir)

    if args.export:
        b = sampler.export_sampler(args.export)
        print(f"exported bucket-{b} sampler to {args.export}")
        return

    if args.serve:
        srv = make_server(sampler, args.port)
        print(f"serving on http://127.0.0.1:{args.port} (/healthz, /sample)")
        srv.serve_forever()
        return

    if args.labels:
        labels = [int(x) for x in args.labels.split(",")]
    else:
        labels = list(np.arange(args.n) % 10)
    imgs = sampler.sample(labels, jax.random.key(args.seed))
    if args.model == "cifar":
        imgs = (imgs + 1.0) / 2.0
    n = len(imgs)
    side = int(np.floor(np.sqrt(n)))
    save_images(imgs[: side * side], (side, side), args.out)
    print(f"wrote {args.out} ({side}x{side} grid)")


if __name__ == "__main__":
    main()
