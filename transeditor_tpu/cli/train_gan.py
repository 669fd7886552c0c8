"""GAN training CLI (the train_spatial_query.py analogue).

Usage:
  python -m transeditor_tpu.cli.train_gan DATA_DIR --exp_name run1 \
      --batch 16 --size 256 [--iter 800000] [--resume out/run1/checkpoint]

DATA_DIR: image folder (or LMDB dir with --lmdb).
"""

from __future__ import annotations

import argparse
import os

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.cli.common import add_model_flags, model_config_from_args
from transeditor_tpu.data.dataset import ImageFolderSource, make_train_iterator
from transeditor_tpu.train.loop import train


def build_configs(args) -> tuple[ModelConfig, TrainConfig]:
    cfg = model_config_from_args(args)
    tcfg = TrainConfig(
        total_steps=args.iter,
        batch_size=args.batch,
        lr=args.lr,
        r1_gamma=args.r1,
        d_reg_every=args.d_reg_every,
        g_reg_every=args.g_reg_every,
        path_regularize=args.path_regularize,
        path_batch_shrink=args.path_batch_shrink,
        grad_accum=args.grad_accum,
        spatial_regu=args.spatial_regu,
        spatial_path_regularize=args.spatial_path_regularize,
        regu_space=args.regu_space,
        n_sample=args.n_sample,
        seed=args.seed,
    )
    return cfg, tcfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str)
    p.add_argument("--exp_name", type=str, default="test")
    p.add_argument("--iter", type=int, default=800_000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n_sample", type=int, default=64)
    p.add_argument("--r1", type=float, default=10.0)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--path_regularize", type=float, default=2.0)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split the D/G losses over K sequential "
                        "microbatches (activation-HBM knob for large "
                        "sizes; the averaged gradient is exact)")
    p.add_argument("--spatial_regu", action="store_true")
    p.add_argument("--spatial_path_regularize", type=float, default=2.0)
    p.add_argument("--regu_space", type=str, default="p+")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="out")
    p.add_argument("--lmdb", action="store_true",
                   help="force the native LMDB loader")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from (latest step)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO/FSDP: shard large params + optimizer "
                        "moments over the data axis (multi-device only)")
    p.add_argument("--wandb", action="store_true",
                   help="log scalars to wandb if installed (gated soft "
                        "dependency, reference train_spatial_query.py:"
                        "16-20,396)")
    add_model_flags(p)
    args = p.parse_args(argv)

    # multi-host: one process per host, triggered by the env protocol
    # (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) — the reference's
    # WORLD_SIZE-triggered NCCL init (train_spatial_query.py:422-428).
    # Must run before any other jax call so the backend sees the slice.
    from transeditor_tpu.parallel import multihost
    if multihost.initialize():
        print(f"multi-host: process {multihost.process_index()}/"
              f"{multihost.process_count()}")

    cfg, tcfg = build_configs(args)
    # tcfg.batch_size is the GLOBAL batch; each host loads its
    # 1/process_count slice (the DistributedSampler analogue) and the
    # train loop assembles the host-sharded global array.
    local_batch = multihost.local_batch_size(tcfg.batch_size)
    host_kw = dict(host_index=multihost.process_index(),
                   host_count=multihost.process_count())
    if args.lmdb or os.path.exists(os.path.join(args.path, "data.mdb")):
        from transeditor_tpu.data.native import NativeLMDBLoader
        # uint8 frames + on-device normalization; decode fans out over
        # the host cores
        data = NativeLMDBLoader(args.path, local_batch, cfg.size,
                                seed=tcfg.seed, as_uint8=True,
                                workers=max(1, (os.cpu_count() or 2) - 1),
                                **host_kw)
    else:
        source = ImageFolderSource(args.path)
        # uint8 batches; the train step normalizes on device
        data = make_train_iterator(source, local_batch, cfg.size,
                                   seed=tcfg.seed, normalize=False,
                                   **host_kw)
    state, start_step = None, 0
    if args.resume:
        import jax
        from transeditor_tpu.io.checkpoint import restore_train_state
        from transeditor_tpu.train.gan import init_state
        template = init_state(cfg, tcfg, jax.random.PRNGKey(tcfg.seed))
        state, ckpt_step = restore_train_state(args.resume, template)
        # the checkpoint holds the state AFTER step N ran — continue at
        # N+1 (the reference re-runs step N on resume because
        # torch.save overwrites; redoing a step with restored RNG-free
        # state here would double-apply it)
        start_step = ckpt_step + 1
        print(f"resumed from step {ckpt_step} -> continuing at "
              f"{start_step}")

    train(cfg, tcfg, data, out_dir=args.out_dir, exp_name=args.exp_name,
          state=state, start_step=start_step, fsdp=args.fsdp,
          use_wandb=args.wandb)


if __name__ == "__main__":
    main()
