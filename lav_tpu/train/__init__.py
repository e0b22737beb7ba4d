from lav_tpu.train.privileged import (  # noqa: F401
    make_bev_train_step,
    make_seg_train_step,
    make_bra_train_step,
)
from lav_tpu.train.distill import make_full_train_step  # noqa: F401
from lav_tpu.train.checkpoints import save_checkpoint, load_checkpoint  # noqa: F401
