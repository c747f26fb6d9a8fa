"""Custom Pallas TPU kernels for the hot ops (with jnp fallbacks in the
portable op layer).  Compiled natively on TPU; interpreter mode elsewhere."""

from rcgan_tpu.ops.pallas.runtime import interpret_mode, kernel_enabled, pallas_enabled

__all__ = ["interpret_mode", "kernel_enabled", "pallas_enabled"]
