"""Exporter/converter bijection: params -> torch SD -> params is exact."""

import numpy as np
import jax

from lav_tpu.config import tiny_config
from lav_tpu.models.planner import bev_planner_init, uniplanner_init
from lav_tpu.utils import weights as W


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bev_planner_export_convert_roundtrip():
    cfg = tiny_config()
    p = bev_planner_init(jax.random.key(0), cfg)
    sd = W.export_bev_planner(p, num_cmds=cfg.num_cmds)
    back = W.convert_bev_planner(sd, num_cmds=cfg.num_cmds)
    _assert_trees_equal(p, back)


def test_uniplanner_export_convert_roundtrip():
    cfg = tiny_config()
    p = uniplanner_init(jax.random.key(1), cfg)
    sd = W.export_uniplanner(p, num_cmds=cfg.num_cmds)
    back = W.convert_uniplanner(sd, num_cmds=cfg.num_cmds)
    _assert_trees_equal(p, back)
