#!/usr/bin/env python
"""MNIST entry point — flag-parity equivalent of the reference
``mnist/main.py`` (invoke via the ``run_*.sh`` scripts or directly)."""

from rcgan_tpu.apps.mnist_app import main

if __name__ == "__main__":
    main()
