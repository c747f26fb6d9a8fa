from rcgan_tpu.data.confusion import build_confusion, corrupt_labels, make_label_tuple, one_coin_matrix

__all__ = ["build_confusion", "corrupt_labels", "make_label_tuple", "one_coin_matrix"]
