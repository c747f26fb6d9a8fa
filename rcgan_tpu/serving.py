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


def _load_run_config(checkpoint_dir: str) -> dict:
    """The apps archive every flag as ``config.json`` in the run dir
    (``utils/run_dir.py::record_setting``); the checkpoint lives one level
    below (``<run>/ckpt`` or ``<run>/checkpoint``).  Search the checkpoint
    dir and two ancestors so a Sampler pointed at any of them self-configures."""
    import json

    d = os.path.abspath(checkpoint_dir)
    for _ in range(3):
        path = os.path.join(d, "config.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        d = os.path.dirname(d)
    return {}


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
        """Build the restore template ALGORITHM-AWARE: an RCGAN-U
        checkpoint carries confusion-matrix (and perm-classifier) state
        that a plain-rcgan template would reject at orbax restore time.

        Config resolution, lowest to highest precedence: dataclass
        defaults < the run's archived ``config.json`` (auto-detected next
        to ``checkpoint_dir``) < explicit ``overrides`` (model-config
        fields like ``dim_g`` and algo fields like ``algorithm=`` /
        ``estimate_confuse=`` are routed to the right config by name).
        """
        import dataclasses

        from rcgan_tpu.data.confusion import one_coin_matrix
        from rcgan_tpu.train.checkpoint import Checkpointer

        run_cfg = dict(_load_run_config(checkpoint_dir))
        run_cfg.update(overrides)

        def pick(dc_type):
            fields = {f.name for f in dataclasses.fields(dc_type)}
            return {k: v for k, v in run_cfg.items() if k in fields}

        batch = max(buckets)
        if model == "cifar":
            from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
            from rcgan_tpu.models.resnet_gan import ResnetGANConfig
            from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

            mkw = pick(ResnetGANConfig)
            mkw.setdefault("algorithm", run_cfg.get("algorithm", "rcgan"))
            cfg = ResnetGANConfig(**mkw)
            akw = pick(CifarAlgoConfig)
            akw["algorithm"] = cfg.algorithm
            akw.setdefault("perm_classifier", bool(run_cfg.get("perm_classifier", False)))
            trainer = CifarTrainer(cfg, CifarAlgoConfig(**akw),
                                   CifarTrainConfig(), one_coin_matrix(0.6, 10))
            ts = trainer.init(jax.random.key(0), batch)
            z_dim = cfg.z_dim
        elif model == "mnist":
            from rcgan_tpu.algorithms.mnist import MnistAlgoConfig
            from rcgan_tpu.models.dcgan import DCGANConfig
            from rcgan_tpu.train.mnist_loop import MnistTrainer, MnistTrainConfig

            mkw = pick(DCGANConfig)
            if "concat_y_layers" in mkw:
                mkw["concat_y_layers"] = tuple(int(x) for x in mkw["concat_y_layers"])
            cfg = DCGANConfig(**mkw)
            akw = pick(MnistAlgoConfig)
            akw.setdefault("algorithm", run_cfg.get("algorithm", "rcgan"))
            # the MNIST CLI exposes perm_regularizer as --aux_classifier too
            if "aux_classifier" in run_cfg and run_cfg["aux_classifier"] is not None:
                akw.setdefault("perm_regularizer", bool(run_cfg["aux_classifier"]))
            trainer = MnistTrainer(cfg, MnistAlgoConfig(**akw),
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
# Request-size ceiling for the single-threaded HTTP endpoint: a huge ?n=
# would block the server and exhaust device memory.
MAX_REQUEST_SAMPLES = 1024


def _to_png_grid(imgs: np.ndarray) -> bytes:
    from rcgan_tpu.utils.images import merge

    # ceil-sided grid padded with blank tiles so every requested image
    # appears (floor-sided truncation dropped up to 2*side images).
    n = len(imgs)
    side = max(1, int(np.ceil(np.sqrt(n))))
    if side * side > n:
        pad = np.zeros((side * side - n,) + imgs.shape[1:], imgs.dtype)
        imgs = np.concatenate([imgs, pad], axis=0)
    grid = merge(imgs, (side, side))
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
                    if not 1 <= n <= MAX_REQUEST_SAMPLES:
                        return self._send(
                            400, b"n out of range (1..%d)" % MAX_REQUEST_SAMPLES)
                    labels = list(np.arange(n) % 10)
                seed = int(q.get("seed", ["0"])[0])
            except ValueError:
                return self._send(400, b"bad labels/seed")
            if len(labels) > MAX_REQUEST_SAMPLES:
                return self._send(
                    400, b"too many samples requested (max %d)" % MAX_REQUEST_SAMPLES)
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
    p.add_argument("--algorithm", default=None,
                   help="override the checkpoint's training algorithm (usually "
                        "auto-detected from the run's config.json)")
    args = p.parse_args(argv)

    overrides = {} if args.algorithm is None else {"algorithm": args.algorithm}
    sampler = Sampler.from_checkpoint(args.model, args.checkpoint_dir, **overrides)

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
