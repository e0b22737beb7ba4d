"""lav_tpu — a TPU-native (JAX/XLA/Pallas) perception–prediction–planning framework.

Re-implements the capabilities of dotchen/LAV ("Learning from All Vehicles",
CVPR 2022) with a TPU-first architecture:

- static-shape, masked tensor formulations everywhere (no dynamic shapes in jit)
- pillar voxelization via segment ops / Pallas kernels instead of CUDA scatter
- GRU trajectory decoding via `lax.scan`, command branches via `vmap`
- a single fused, jittable closed-loop agent step (camera + LiDAR + GPS/IMU in,
  steer/throttle/brake out) that can be vmapped over many ego vehicles
- data-parallel training via `jax.sharding.Mesh` + NamedSharding

Package layout:
  core/     pure-JAX geometry, warping, rasterization primitives
  nn/       functional NN layers (conv/bn/gru/resnet/erfnet) with torch parity
  ops/      pillar featurizer, peak extraction, point painting
  models/   LiDARModel, BEVPlanner, UniPlanner, RGB nets, losses
  agent/    EKF, PID, waypointer, fused closed-loop agent
  data/     episode stores + staged datasets (LAV LMDB schema compatible)
  train/    staged trainers (bev/seg/bra/full) as jitted train steps
  parallel/ mesh + sharding helpers
  utils/    torch->jax weight conversion, config
"""

__version__ = "0.1.0"

from lav_tpu.config import LAVConfig, load_config  # noqa: F401
