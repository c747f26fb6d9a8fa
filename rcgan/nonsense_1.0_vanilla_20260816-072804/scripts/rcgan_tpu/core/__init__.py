from rcgan_tpu.core.module import Ctx, Transformed, count_params, merge, split_by_prefix, transform

__all__ = ["Ctx", "Transformed", "count_params", "merge", "split_by_prefix", "transform"]
