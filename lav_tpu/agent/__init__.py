from lav_tpu.agent.ekf import EKFState, ekf_make, ekf_init_state, ekf_predict_update  # noqa: F401
from lav_tpu.agent.pid import pid_make, pid_step  # noqa: F401
from lav_tpu.agent.control import pid_control, plan_collide  # noqa: F401
from lav_tpu.agent.route import Waypointer, RoutePlanner  # noqa: F401
