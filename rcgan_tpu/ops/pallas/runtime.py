"""Pallas runtime gating: kernels compile natively on TPU and fall back to
interpreter mode elsewhere (the CPU test mesh)."""

from __future__ import annotations

import os

import jax

_FORCE = os.environ.get("RCGAN_PALLAS_INTERPRET")


def interpret_mode() -> bool:
    if _FORCE is not None:
        return _FORCE not in ("0", "false", "")
    return jax.default_backend() != "tpu"


def pallas_enabled() -> bool:
    """Whether model code should route through Pallas kernels by default:
    on TPU yes; elsewhere only when explicitly forced (interpret mode is too
    slow for routine CPU testing)."""
    env = os.environ.get("RCGAN_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def kernel_enabled(name: str, default: bool | None = None) -> bool:
    """Per-kernel routing override: ``RCGAN_PALLAS_<NAME>=0/1`` wins, then
    ``default`` (a kernel may default off when the XLA path measured
    faster), then the global :func:`pallas_enabled`.  Used for per-kernel
    A/B benchmarking and for shipping measured-good defaults."""
    env = os.environ.get(f"RCGAN_PALLAS_{name.upper()}")
    if env is not None:
        return env not in ("0", "false", "")
    if default is not None:
        return default and pallas_enabled()
    return pallas_enabled()
