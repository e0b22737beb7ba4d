from lav_tpu.ops.pillar import (  # noqa: F401
    compute_pillar_ids,
    decorate_points,
    point_pillar_init,
    point_pillar_apply,
)
from lav_tpu.ops.peak import extract_peaks, det_inference  # noqa: F401
from lav_tpu.ops.painting import CameraRig, point_painting  # noqa: F401
