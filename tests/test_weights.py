"""Weight converter: torch-layout state dicts -> lav_tpu param trees."""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp
import pytest

from lav_tpu.config import tiny_config
from lav_tpu.models.planner import (
    bev_planner_init, planner_core_init, cast, EMBD,
)
from lav_tpu.utils import weights as W
from lav_tpu.nn import layers as L


def _np_sd(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(np.shape(x)), t)


def test_planner_core_conversion_structure_and_numerics(rng):
    """Build the reference checkpoint layout with plain torch modules and
    check the converted bank reproduces torch GRU outputs per command."""
    num_cmds, T, B = 3, 4, 2

    class Core(nn.Module):
        def __init__(self):
            super().__init__()
            self.plan_gru = nn.GRU(4, EMBD, batch_first=True)
            self.plan_mlp = nn.Linear(EMBD, 2)
            self.cast_grus = nn.ModuleList(
                [nn.GRU(EMBD, 64, batch_first=True) for _ in range(num_cmds)]
            )
            self.cast_mlps = nn.ModuleList(
                [nn.Linear(64, 2) for _ in range(num_cmds)]
            )
            self.cast_cmd_pred = nn.Sequential(
                nn.Linear(EMBD, num_cmds), nn.Sigmoid()
            )

    tc = Core()
    sd = _np_sd(tc)
    p = W._planner_core(sd, "", num_cmds)

    # structure/shape parity with our init
    init = planner_core_init(jax.random.key(0), num_cmds)
    assert _tree_shapes(p) == _tree_shapes(init)

    # numerics: our vmapped cast == per-branch torch GRU + cumsum
    embd = rng.normal(size=(B, EMBD)).astype(np.float32)
    ours = np.asarray(cast(jax.tree.map(jnp.asarray, p), jnp.asarray(embd), T))
    u = torch.tensor(embd)[:, None].expand(B, T, EMBD)
    for c in range(num_cmds):
        out, _ = tc.cast_grus[c](u)
        ref = torch.cumsum(tc.cast_mlps[c](out), dim=1).detach().numpy()
        np.testing.assert_allclose(ours[:, c], ref, atol=1e-4)


def test_conv_bn_linear_conversion_numerics(rng):
    conv = nn.Conv2d(3, 8, 3, padding=1)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    sd = {f"c.{k}": v for k, v in _np_sd(conv).items()}
    p = jax.tree.map(jnp.asarray, W._conv(sd, "c"))
    ours = np.asarray(
        L.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)), padding=1)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, conv(torch.tensor(x)).detach().numpy(),
                               atol=1e-4)


def test_full_bev_planner_roundtrip_structure():
    """A synthetic reference-layout SD for the full BEVPlanner converts into
    exactly our init tree's structure and shapes."""
    cfg = tiny_config()
    init = bev_planner_init(jax.random.key(0), cfg)

    # construct the torch-layout SD from the init tree by inverting the
    # converter's layout transforms (tests the mapping is a bijection)
    sd = {}

    def put_conv(name, p, transpose):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(*transpose)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_bn(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])
        sd[f"{name}.running_mean"] = np.asarray(p["mean"])
        sd[f"{name}.running_var"] = np.asarray(p["var"])

    def put_resnet(prefix, rp):
        put_conv(f"{prefix}conv1", rp["conv1"], (3, 2, 0, 1))
        put_bn(f"{prefix}bn1", rp["bn1"])
        for stage, blocks in enumerate((2, 2, 2, 2)):
            for b in range(blocks):
                blk = rp[f"layer{stage + 1}_{b}"]
                t = f"{prefix}layer{stage + 1}.{b}"
                put_conv(f"{t}.conv1", blk["conv1"], (3, 2, 0, 1))
                put_bn(f"{t}.bn1", blk["bn1"])
                put_conv(f"{t}.conv2", blk["conv2"], (3, 2, 0, 1))
                put_bn(f"{t}.bn2", blk["bn2"])
                if "down_conv" in blk:
                    put_conv(f"{t}.downsample.0", blk["down_conv"], (3, 2, 0, 1))
                    put_bn(f"{t}.downsample.1", blk["down_bn"])

    put_resnet("bev_conv_emb.0.", init["bev_conv_emb"])
    for gname in ("plan_gru",):
        g = init[gname]
        sd[f"{gname}.weight_ih_l0"] = np.asarray(g["w_ih"]).T
        sd[f"{gname}.weight_hh_l0"] = np.asarray(g["w_hh"]).T
        sd[f"{gname}.bias_ih_l0"] = np.asarray(g["b_ih"])
        sd[f"{gname}.bias_hh_l0"] = np.asarray(g["b_hh"])
    sd["plan_mlp.weight"] = np.asarray(init["plan_mlp"]["w"]).T
    sd["plan_mlp.bias"] = np.asarray(init["plan_mlp"]["b"])
    for i in range(cfg.num_cmds):
        g = jax.tree.map(lambda x: np.asarray(x)[i], init["cast_grus"])
        sd[f"cast_grus.{i}.weight_ih_l0"] = g["w_ih"].T
        sd[f"cast_grus.{i}.weight_hh_l0"] = g["w_hh"].T
        sd[f"cast_grus.{i}.bias_ih_l0"] = g["b_ih"]
        sd[f"cast_grus.{i}.bias_hh_l0"] = g["b_hh"]
        m = jax.tree.map(lambda x: np.asarray(x)[i], init["cast_mlps"])
        sd[f"cast_mlps.{i}.weight"] = m["w"].T
        sd[f"cast_mlps.{i}.bias"] = m["b"]
    sd["cast_cmd_pred.0.weight"] = np.asarray(init["cast_cmd_pred"]["w"]).T
    sd["cast_cmd_pred.0.bias"] = np.asarray(init["cast_cmd_pred"]["b"])

    conv = W.convert_bev_planner(sd, num_cmds=cfg.num_cmds)
    assert _tree_shapes(conv) == _tree_shapes(init)
    # values roundtrip exactly
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
