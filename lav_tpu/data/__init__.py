from lav_tpu.data.store import (  # noqa: F401
    DictStore,
    Episode,
    open_episode,
    make_synthetic_episode,
)
from lav_tpu.data.datasets import get_dataset  # noqa: F401
from lav_tpu.data.loader import DataLoader  # noqa: F401
