"""Time-bounded probe of the default JAX backend.

This box's sitecustomize pins ``jax_platforms="axon,cpu"`` (a remote TPU
tunnel).  When the tunnel is down, axon backend *discovery* BLOCKS rather
than failing, and a hung in-process probe cannot be interrupted — so the
probe runs in a subprocess with a timeout.  The tunnel also has a
HALF-DEAD failure mode (observed live: ``jax.devices()`` returns in
0.1 s while the first executed op blocks forever), so the probe must
EXECUTE one tiny computation, not just enumerate devices.
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
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp; assert jax.devices(); "
                "assert float(jnp.ones((8, 8)).sum()) == 64.0",
            ],
            timeout=timeout_s, capture_output=True,
        )
        _cached = r.returncode == 0
    except subprocess.TimeoutExpired:
        _cached = False
    return _cached
