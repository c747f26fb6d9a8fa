"""Time-bounded probe of the default JAX backend.

This box's sitecustomize pins ``jax_platforms="axon,cpu"`` (a remote TPU
tunnel).  When the tunnel is down, axon backend *discovery* BLOCKS rather
than failing, and a hung in-process probe cannot be interrupted — so the
probe runs ``import jax; jax.devices()`` in a subprocess with a timeout.
The result is memoized per process: callers (bench.py, __graft_entry__)
may probe more than once and must not pay repeated dead-probe timeouts.
"""

from __future__ import annotations

import subprocess
import sys

_cached: bool | None = None


def default_backend_reachable(timeout_s: float = 120) -> bool:
    global _cached
    if _cached is not None:
        return _cached
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        _cached = r.returncode == 0
    except subprocess.TimeoutExpired:
        _cached = False
    return _cached
