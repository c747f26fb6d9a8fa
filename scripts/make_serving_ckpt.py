"""Save a flagship-shape CIFAR checkpoint for the serving bench.

Round 5's box reset deleted the 50k training checkpoints (`runs/` is not
committed), so the serving latency/throughput bench
(`scripts/bench_serving.py`) needs a restore target.  Serving PERF is
independent of the weight values — latency and coalesced throughput are
functions of the model architecture and buckets only — so an init-state
checkpoint at the exact flagship shape (`ResnetGANConfig()` defaults, the
reference's `gan_resnet.py` DIM=128 model) gives the same numbers as a
trained one while costing seconds, not hours.  The run dir is labeled
`init_weights: true` in its config.json so nobody mistakes its SAMPLES for
trained output.

Usage: python scripts/make_serving_ckpt.py <out_dir> [max_batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    out = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "runs/round5/serving_ckpt")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax

    from rcgan_tpu.algorithms.cifar import CifarAlgoConfig
    from rcgan_tpu.data.confusion import one_coin_matrix
    from rcgan_tpu.models.resnet_gan import ResnetGANConfig
    from rcgan_tpu.train.checkpoint import Checkpointer
    from rcgan_tpu.train.cifar_loop import CifarTrainer, CifarTrainConfig

    cfg = ResnetGANConfig()
    trainer = CifarTrainer(cfg, CifarAlgoConfig(algorithm="rcgan"),
                           CifarTrainConfig(), one_coin_matrix(0.6, 10))
    ts = trainer.init(jax.random.key(0), batch)

    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({"algorithm": "rcgan", "init_weights": True}, f)
    ckpt = Checkpointer(os.path.join(out, "ckpt"), max_to_keep=1)
    ckpt.save(0, ts, wait=True)
    ckpt.close()
    print(f"wrote init-state flagship checkpoint to {out}/ckpt (batch template {batch})")


if __name__ == "__main__":
    main()
