from lav_tpu.nn import layers  # noqa: F401
from lav_tpu.nn.layers import (  # noqa: F401
    linear_init, linear,
    conv2d_init, conv2d,
    conv_transpose2d_init, conv_transpose2d,
    batchnorm_init, batchnorm, batchnorm_apply,
    gru_init, gru,
    max_pool2d, avg_pool_global, dropout,
)
