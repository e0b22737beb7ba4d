"""The committed int8 calibration fallback must cover the default config.

ADVICE r4: the repo fallback path `artifacts/calib/<hash>.json` is only
useful if a file with the CURRENT default-config hash is actually
committed — otherwise a wiped user cache silently pays the ~13-20 min
eager CPU recalibration (or, in the bench, falls back to bf16 and the
headline number quietly changes config).  This test recomputes the cache
key exactly as `__graft_entry__._calib_cache_lookup` does (CPU; the key
is backend-independent because jax.random is deterministic across
backends and w_scale is an absmax, not a sum) and asserts the artifact
exists and parses.
"""

import json
import pathlib
import sys

import numpy as np
import jax

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def test_default_config_calib_artifact_committed():
    import __graft_entry__ as g
    from lav_tpu.config import v2_config
    from lav_tpu.models.lidar import lidar_model_init
    from lav_tpu.models.planner import uniplanner_init
    from lav_tpu.nn.quant import quantize_tree

    cfg = v2_config()
    ks = jax.random.split(jax.random.key(0), 4)
    # the bench's BENCH_INT8=mxu tree: lidar backbone + planner crop resnet
    qparams = {
        "lidar_model": quantize_tree(
            lidar_model_init(ks[0], cfg.num_input, cfg.num_features)),
        "uniplanner": quantize_tree(uniplanner_init(ks[1], cfg)),
    }
    import hashlib
    h = hashlib.sha256()
    h.update(f"v{g._CALIB_VERSION}|{cfg}|{(288, 256)}|{2}".encode())
    for path, p in g._walk_scale_paths(qparams):
        h.update(path.encode())
        h.update(str(p["w_int8"].shape).encode())
        h.update(np.asarray(p["w_scale"], np.float32).tobytes())
    name = f"calib-{h.hexdigest()[:24]}.json"
    artifact = REPO / "artifacts" / "calib" / name
    assert artifact.exists(), (
        f"default-config calibration fallback missing: {artifact} — "
        "regenerate by running bench.py setup once with a warm user cache "
        "and copying /root/.cache/lav_tpu/<name>.json into artifacts/calib/"
    )
    scales = json.loads(artifact.read_text())
    assert scales and all(
        isinstance(v, float) and v > 0 for v in scales.values()
    )
    # every quantized conv on the INFERENCE path has a scale entry (the
    # frozen bev teacher inside uniplanner never runs in the agent, so the
    # calibration replay records no activation scales for it)
    paths = {p for p, _ in g._walk_scale_paths(qparams)
             if not p.startswith("/uniplanner/bev_planner")}
    missing = paths - set(scales)
    assert not missing, f"calib artifact missing scales for {sorted(missing)[:5]}"
