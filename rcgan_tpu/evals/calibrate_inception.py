"""Calibrate the inception scorer on REAL data.

The reference records the real-CIFAR-10 anchor as a comment: 11.34 (one
split) / 11.31 ± 0.08 (10 splits) under frozen Inception-v3
(``cifar10/common/inception/inception_score_.py:82``).  This CLI reproduces
that measurement so any scorer (Inception-v3 weights dropped into
``--data_dir``, or the compact stand-in) has a recorded real-data anchor to
compare generated-sample scores against::

    python -m rcgan_tpu.evals.calibrate_inception --data_dir ../data/cifar10 \
        [--n 50000] [--splits 10]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", default="../data/cifar10/cifar-10-batches-py/")
    p.add_argument("--n", type=int, default=50000)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--allow_synthetic", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fall back to synthetic data when real CIFAR files "
                        "are missing (--no-allow_synthetic to require real)")
    args = p.parse_args(argv)

    import jax

    from rcgan_tpu.data import cifar10 as cifar_data
    from rcgan_tpu.evals import inception_v3
    from rcgan_tpu.evals.inception import real_data_score

    import os

    real_files_present = all(
        os.path.exists(os.path.join(args.data_dir, f))
        for f in cifar_data.TRAIN_FILES + cifar_data.TEST_FILES
    )
    train_split, dev_split = cifar_data.load(
        args.data_dir, alpha=1.0, allow_synthetic=args.allow_synthetic
    )
    if not real_files_present:
        print("WARNING: real CIFAR-10 batches not found under "
              f"{args.data_dir!r} — calibrating on SYNTHETIC stand-in data. "
              "This anchor is NOT comparable to the reference's 11.31 "
              "real-data score. Pass --no-allow_synthetic to fail instead.")
    imgs = train_split.images[: args.n].astype(np.float32)
    imgs = 2.0 * (imgs / 255.0 - 0.5)
    imgs = imgs.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # CHW-flat -> HWC

    iv3_path = inception_v3.find_weights(args.data_dir)
    if iv3_path is not None:
        params = inception_v3.load_weights(iv3_path)
        inception_v3.validate_weights(params)
        logits_fn = inception_v3.make_logits_fn(params)
        scorer = f"inception_v3 ({iv3_path})"
    else:
        from rcgan_tpu.evals.classifier import cifar_classifier

        cls = cifar_classifier()
        cls.train(jax.random.key(0), imgs[:20000], train_split.labels_actual[:20000], epochs=3)
        logits_fn = lambda x: cls.logits(cls.params, x)
        scorer = "compact stand-in (NOT on the 11.31 scale)"

    mean, std = real_data_score(imgs, logits_fn, batch=args.batch, splits=args.splits)
    print(f"scorer: {scorer}")
    print(f"real-data inception score over {len(imgs)} images: {mean:.3f} +/- {std:.3f}")
    print("reference anchor (Inception-v3, real CIFAR-10): 11.31 +/- 0.08")


if __name__ == "__main__":
    main()
