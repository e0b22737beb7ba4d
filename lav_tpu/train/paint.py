"""Offline point-painting pass as a batched jitted job.

Replaces the reference's ray actor pool (lav/data_paint.py:43-107,
@ray.remote(num_gpus=1/4) per actor): on TPU a single jitted function
segments all 5 cameras and paints the sweep; frames stream through in
device-sized batches and results commit back to the episode store.

    python -m lav_tpu.train.paint --config-path config.yaml \
        --seg-checkpoint checkpoints/seg/seg_1
"""

from __future__ import annotations

import argparse
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from lav_tpu.config import load_config, v1_config
from lav_tpu.data.datasets import get_dataset
from lav_tpu.models.rgb import seg_model_apply, seg_model_init
from lav_tpu.ops.painting import CameraRig, point_painting
from lav_tpu.train.checkpoints import load_checkpoint


def make_paint_fn(cfg, rgb_hw=(288, 256), fov=64):
    rigs = tuple(
        CameraRig.build(yaw, lidar_xyz=(0, 0, cfg.camera_z),
                        cam_xyz=(cfg.camera_x, 0, cfg.camera_z),
                        rgb_h=rgb_hw[0], rgb_w=rgb_hw[1], fov=fov)
        for yaw in cfg.camera_yaws
    )

    @jax.jit
    def paint(seg_params, rgbs, lidar_xyz, lidar_valid):
        """rgbs (num_cams, H, W, 3); lidar_xyz (P, 3); -> (P, n_sem)."""
        logits, _ = seg_model_apply(seg_params, rgbs, False)
        prob = jax.nn.softmax(logits, axis=-1)
        # normalize class probs by foreground confidence
        # (reference data_paint.py:75: sems[:,1:] * (1 - sems[:,:1]))
        sem = prob[..., 1:] * (1.0 - prob[..., :1])
        return point_painting(lidar_xyz, sem, rigs, valid=lidar_valid)

    return paint


def run_paint(cfg, seg_params, episodes=None, max_points: int = 40000,
              rgb_hw=(288, 256)):
    ds = get_dataset("point_paint", cfg, episodes)
    paint = make_paint_fn(cfg, rgb_hw=rgb_hw)
    for i in range(len(ds)):
        s = ds[i]
        n = len(s["lidar"])
        pts = np.zeros((max_points, 3), np.float32)
        valid = np.zeros((max_points,), bool)
        k = min(n, max_points)
        pts[:k] = s["lidar"][:k, :3]
        valid[:k] = True
        painted = np.asarray(
            paint(seg_params, jnp.asarray(s["rgbs"], jnp.float32),
                  jnp.asarray(pts), jnp.asarray(valid))
        )
        out = np.zeros((n, painted.shape[-1]), np.float32)
        out[:k] = painted[:k]
        ds.commit(i, out)
    return len(ds)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-path", default=None)
    p.add_argument("--seg-checkpoint", required=True)
    args = p.parse_args()
    cfg = load_config(args.config_path) if args.config_path else v1_config()
    params = seg_model_init(jax.random.key(0), len(cfg.seg_channels))
    params = load_checkpoint(args.seg_checkpoint, params)
    n = run_paint(cfg, params)
    print(f"painted {n} frames")


if __name__ == "__main__":
    main()
