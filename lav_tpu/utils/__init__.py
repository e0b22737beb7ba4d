from lav_tpu.utils.tree import merge_bn_state  # noqa: F401
