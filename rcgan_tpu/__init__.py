"""rcgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for training
conditional GANs robust to noisy labels.

A ground-up rebuild of the capabilities of tkkiran/Robust-Conditional-GAN
("Robustness of conditional GANs to noisy labels", NeurIPS 2018,
arXiv 1811.03205): six training modes (biased, unbiased, ambient, RCGAN,
RCGAN-U with a learned confusion matrix + permutation regularizer, RCGAN+y),
two model zoos (MNIST conditional DCGAN; CIFAR-10 SNGAN with projection
discriminator on a ResNet backbone), data pipelines with noisy-label
corruption, and the evaluation suite (generator label accuracy, inception
score, label recovery, MS-SSIM) — designed SPMD-first for TPU meshes.
"""

__version__ = "0.1.0"

import os as _os

if "RCGAN_PLATFORM" in _os.environ:
    # Opt-in platform pin that works even where a site-wide sitecustomize
    # overrides JAX_PLATFORMS at interpreter start (this box pins
    # ``jax_platforms="axon,cpu"``, and axon *discovery* blocks when the
    # device tunnel is down — so subprocesses spawned by tests must be able
    # to force CPU through the package itself, before any backend client
    # is created).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RCGAN_PLATFORM"])
