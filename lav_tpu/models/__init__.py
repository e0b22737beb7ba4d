from lav_tpu.models.lidar import lidar_model_init, lidar_model_apply  # noqa: F401
from lav_tpu.models.planner import (  # noqa: F401
    bev_planner_init,
    bev_planner_forward,
    bev_planner_infer,
    uniplanner_init,
    uniplanner_forward,
    uniplanner_infer,
)
from lav_tpu.models.rgb import (  # noqa: F401
    seg_model_init,
    seg_model_apply,
    brake_model_init,
    brake_model_apply,
)
from lav_tpu.models import losses  # noqa: F401
