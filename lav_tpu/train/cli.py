"""Training CLIs: the staged pipeline entry points.

Mirrors the reference drivers (lav/train_{bev,seg,bra,full}[_v2].py and
docs/TRAINING.md:23-77) with the same stage order, defaults (bev bs=512
(v2 256) x160ep, seg bs=256 x1ep, bra bs=52 x10ep, full bs=32 x64ep,
lr=3e-4, seed 2021), StepLR schedule, per-epoch checkpoints, and the v2
other_weight ramp 1 - 0.8^(it/4000) (train_bev_v2.py:36-37).

Usage:
    python -m lav_tpu.train.cli bev  --config-path config.yaml
    python -m lav_tpu.train.cli full --config-path config_v2.yaml --v2 \
        --motion-only
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lav_tpu.config import load_config, v1_config, v2_config
from lav_tpu.data.datasets import get_dataset
from lav_tpu.data.loader import DataLoader
from lav_tpu.models.lidar import lidar_model_init
from lav_tpu.models.planner import bev_planner_init, uniplanner_init
from lav_tpu.models.rgb import brake_model_init, seg_model_init
from lav_tpu.parallel import (batch_sharding, make_hybrid_mesh,
                              make_mesh, replicate)
from lav_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from lav_tpu.train.distill import make_full_train_step
from lav_tpu.train.privileged import (
    make_bev_train_step, make_bra_train_step, make_seg_train_step, step_lr,
)
from lav_tpu.utils.logging import Logger


def _common_args(p: argparse.ArgumentParser):
    p.add_argument("--config-path", default=None)
    p.add_argument("--v2", action="store_true")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--num-per-log", type=int, default=100)
    p.add_argument("--num-per-save", type=int, default=1)
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--log-wandb", action="store_true")
    p.add_argument("--resume", default=None,
                   help="checkpoint path for exact resume (params + "
                        "optimizer state + epoch/iteration)")
    p.add_argument("--imagenet-weights", default="",
                   help="torchvision resnet18 state_dict .pth for "
                        "ImageNet-pretrained backbone init (reference "
                        "rgb.py pretrained=True)")
    p.add_argument("--dcn-slices", type=int, default=0,
                   help="data-parallel across N TPU slices: builds a "
                        "(dcn, data) hybrid mesh whose minor axis rides "
                        "ICI and whose major axis crosses DCN; gradients "
                        "reduce hierarchically (within-slice first). 0 = "
                        "single-slice 1-D data mesh")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over N micro-batches before "
                        "each optimizer update (effective batch = "
                        "batch-size * N; reaches the reference bs=256/512 "
                        "regime — the 5-channel BEV pads its lane dim "
                        "25.6x on TPU, so huge single batches OOM)")


def _load_cfg(args):
    if args.config_path:
        return load_config(args.config_path)
    return v2_config() if args.v2 else v1_config()


def _other_weight_ramp(it: int, beta: float = 0.8) -> float:
    return 1.0 - beta ** (it / 4000.0)


def _wrap_accum(opt, args):
    """Gradient accumulation: each loader batch becomes a micro-batch;
    optax.MultiSteps applies the averaged update every N micro-steps, so
    `--batch-size 32 --grad-accum 16` trains at the reference's effective
    bs=512 on one chip."""
    if getattr(args, "grad_accum", 1) > 1:
        return optax.MultiSteps(opt, every_k_schedule=args.grad_accum)
    return opt


def _train_loop(stage, cfg, args, params, make_step, dataset, optimizer,
                defaults, v2_extra_arg=False):
    bs = args.batch_size or defaults["bs"]
    epochs = args.num_epoch or defaults["epochs"]
    if getattr(args, "dcn_slices", 0):
        mesh = make_hybrid_mesh(n_slices=args.dcn_slices)
    else:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if bs % n_dev:
        raise ValueError(
            f"batch size {bs} is not divisible by the {n_dev}-device data "
            f"mesh; pick a multiple of {n_dev} "
            f"(e.g. --batch-size {-(-bs // n_dev) * n_dev})"
        )
    params = replicate(mesh, params)
    opt_state = replicate(mesh, optimizer.init(params))
    start_epoch, it = 0, 0

    # exact resume (params + optimizer state + position) — an upgrade over
    # the reference's weights-only torch.save (SURVEY.md §5)
    if getattr(args, "resume", None):
        snap = load_checkpoint(
            args.resume,
            dict(params=params, opt_state=opt_state,
                 epoch=np.int64(0), it=np.int64(0)),
        )
        params, opt_state = snap["params"], snap["opt_state"]
        start_epoch, it = int(snap["epoch"]), int(snap["it"])
        print(f"resumed from {args.resume} at epoch {start_epoch}, it {it}")

    sharding = batch_sharding(mesh)
    loader = DataLoader(dataset, bs, shuffle=True, seed=args.seed,
                        sharding=sharding)
    # donate params + opt state: the loop rebinds both from the step's
    # outputs, so the old buffers alias in place instead of doubling the
    # largest resident arrays (~0.5 GB for the full v2 model under adam —
    # the difference between fitting and OOM at reference batch sizes)
    step = jax.jit(make_step, donate_argnums=(0, 1))
    logger = Logger(f"lav_{stage}", use_wandb=args.log_wandb,
                    save_dir=os.path.join(args.save_dir, stage))
    rng = jax.random.key(args.seed)
    for epoch in range(start_epoch, epochs):
        for batch in loader:
            rng, sub = jax.random.split(rng)
            if v2_extra_arg:
                params, opt_state, m = step(
                    params, opt_state, batch, sub, _other_weight_ramp(it)
                )
            else:
                params, opt_state, m = step(params, opt_state, batch, sub)
            if it % args.num_per_log == 0:
                rec = logger.log(it, {k: v for k, v in m.items()})
                print(f"[{stage}] epoch {epoch} it {it}: "
                      f"loss={rec.get('loss', float('nan')):.4f}")
            it += 1
        if (epoch + 1) % args.num_per_save == 0:
            path = os.path.join(logger.save_dir, f"{stage}_{epoch + 1}")
            save_checkpoint(path, dict(
                params=params, opt_state=opt_state,
                epoch=np.int64(epoch + 1), it=np.int64(it),
            ))
            print(f"saved {path}")
    logger.close()
    if it == 0 and epochs > start_epoch:
        raise RuntimeError(
            f"[{stage}] trained ZERO steps over {epochs - start_epoch} "
            f"epoch(s) — dataset ({len(dataset)} samples) shorter than one "
            f"batch ({bs})?"
        )
    return params


def main_bev(args):
    cfg = _load_cfg(args)
    ds = get_dataset("temporal_bev" if args.v2 else "bev", cfg)
    params = bev_planner_init(jax.random.key(args.seed), cfg)
    defaults = dict(bs=256 if args.v2 else 512, epochs=160)
    steps_per_epoch = max(len(ds) // defaults["bs"], 1)
    opt = _wrap_accum(optax.adam(step_lr(args.lr, steps_per_epoch, 32)), args)
    step = make_bev_train_step(cfg, opt, v2=args.v2)
    _train_loop("bev", cfg, args, params, step, ds, opt, defaults,
                v2_extra_arg=True)


def main_seg(args):
    cfg = _load_cfg(args)
    ds = get_dataset("seg", cfg)
    params = seg_model_init(jax.random.key(args.seed), len(cfg.seg_channels))
    opt = _wrap_accum(optax.adam(args.lr), args)
    step = make_seg_train_step(cfg, opt)
    _train_loop("seg", cfg, args, params, step, ds, opt,
                dict(bs=256, epochs=1))


def _imagenet_sd(cfg, args):
    """Resolve the ImageNet-pretrained resnet18 backbone weights
    (reference rgb.py:47 pretrained=True, downloaded by torchvision; this
    environment has no network, so the flag points at a local torchvision
    resnet18 state_dict .pth instead)."""
    if not (cfg.imagenet_pretrained or args.imagenet_weights):
        return None
    path = args.imagenet_weights or os.environ.get("LAV_IMAGENET_RESNET18", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "imagenet_pretrained is set but no weights file found — pass "
            "--imagenet-weights /path/to/torchvision_resnet18.pth (or set "
            "LAV_IMAGENET_RESNET18); there is no network to download from"
        )
    from lav_tpu.utils.weights import load_torch_state_dict

    return load_torch_state_dict(path)


def main_bra(args):
    cfg = _load_cfg(args)
    ds = get_dataset("bra", cfg)
    params = brake_model_init(jax.random.key(args.seed), 3,
                              version=2 if args.v2 else 1,
                              imagenet_sd=_imagenet_sd(cfg, args))
    opt = _wrap_accum(optax.adam(args.lr), args)
    step = make_bra_train_step(cfg, opt, version=2 if args.v2 else 1)
    _train_loop("bra", cfg, args, params, step, ds, opt,
                dict(bs=52, epochs=10))


def main_full(args):
    cfg = _load_cfg(args)
    name = "temporal_lidar_painted" if args.v2 else "lidar_painted"
    ds = get_dataset(name, cfg)
    k1, k2 = jax.random.split(jax.random.key(args.seed))
    params = {
        "lidar_model": lidar_model_init(k1, cfg.num_input, cfg.num_features),
        "uniplanner": uniplanner_init(k2, cfg),
    }
    # stage pointers: load teacher / warm-start weights like the reference
    # (lav_final.py:40-54) — orbax trees or converted torch checkpoints.
    if cfg.bev_model_dir and os.path.exists(cfg.bev_model_dir):
        from lav_tpu.train.checkpoints import load_params

        params["uniplanner"]["bev_planner"] = load_params(
            cfg.bev_model_dir, params["uniplanner"]["bev_planner"]
        )
    mode = ("perceive_only" if args.perceive_only
            else "motion_only" if args.motion_only else "full")
    defaults = dict(bs=32, epochs=64)
    steps_per_epoch = max(len(ds) // defaults["bs"], 1)
    opt = _wrap_accum(optax.adam(step_lr(args.lr, steps_per_epoch, 16)), args)
    step = make_full_train_step(cfg, opt, v2=args.v2, mode=mode,
                                compute_dtype=jnp.dtype(args.dtype),
                                remat=args.remat)
    _train_loop("full", cfg, args, params, step, ds, opt, defaults)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="stage", required=True)
    for stage in ("bev", "seg", "bra", "full"):
        sp = sub.add_parser(stage)
        _common_args(sp)
        if stage == "full":
            sp.add_argument("--perceive-only", action="store_true")
            sp.add_argument("--motion-only", action="store_true")
            sp.add_argument("--dtype", default="float32",
                            choices=["float32", "bfloat16"],
                            help="compute dtype (losses/params stay f32)")
            sp.add_argument("--remat", action="store_true",
                            help="recompute forwards in backward "
                                 "(reach reference bs=256/512)")
    args = p.parse_args()
    {"bev": main_bev, "seg": main_seg, "bra": main_bra,
     "full": main_full}[args.stage](args)


if __name__ == "__main__":
    main()
