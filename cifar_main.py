#!/usr/bin/env python
"""CIFAR-10 entry point — flag-parity equivalent of the reference
``cifar10/gan_resnet.py`` CLI."""

from rcgan_tpu.apps.cifar_app import main

if __name__ == "__main__":
    main()
