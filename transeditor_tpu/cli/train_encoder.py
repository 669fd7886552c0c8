"""pSp encoder training CLI (the psp_spatial_train.py analogue).

Usage:
  python -m transeditor_tpu.cli.train_encoder --ckpt 790000.pt \
      --dataset_dir train_imgs/ --test_dataset_dir val_imgs/ \
      [--max_steps 500000] [--lpips_weights alex.pt] [--arcface ir_se50.pt]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.data.dataset import ImageFolderSource, make_train_iterator
from transeditor_tpu.io.checkpoint import load_reference_generator
from transeditor_tpu.models.psp import PSPModel
from transeditor_tpu.train.coach import (CoachConfig, make_arcface_id_loss,
                                         make_coach)
from transeditor_tpu.utils.image import make_grid, save_png
from transeditor_tpu.zoo.lpips import LPIPS, load_lpips_params
import orbax.checkpoint as ocp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="decoder .pt bundle")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--test_dataset_dir", required=True)
    p.add_argument("--exp_dir", type=str, default="./psp_out")
    p.add_argument("--max_steps", type=int, default=500_000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lpips_lambda", type=float, default=0.8)
    p.add_argument("--id_lambda", type=float, default=0.1)
    p.add_argument("--l2_lambda", type=float, default=1.0)
    p.add_argument("--w_norm_lambda", type=float, default=0.0)
    p.add_argument("--use_fake_lambda", type=float, default=0.0)
    p.add_argument("--fake_every", type=int, default=10,
                   help="fake-guidance cadence (psp_training_options.py:86)")
    p.add_argument("--val_interval", type=int, default=2500)
    p.add_argument("--save_interval", type=int, default=10_000)
    p.add_argument("--optim_name", type=str, default="ranger")
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--arcface", type=str, default=None)
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(p)
    args = p.parse_args(argv)

    cfg = model_config_from_args(args)
    dec_params = load_reference_generator(args.ckpt, cfg)

    lpips = LPIPS(net="alex")
    x0 = jnp.zeros((1, cfg.size, cfg.size, 3))
    if args.lpips_weights:
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        lpips_params = load_lpips_params(
            load_torch_checkpoint(args.lpips_weights), net="alex")
    else:
        print("WARNING: random LPIPS weights (pass --lpips_weights).")
        lpips_params = lpips.init(jax.random.PRNGKey(0), x0, x0)

    id_apply = None
    if args.arcface and args.id_lambda > 0:
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        from transeditor_tpu.io.zoo_port import port_arcface
        from transeditor_tpu.models.irse import ArcFaceBackbone
        arc_vars = port_arcface(load_torch_checkpoint(args.arcface))
        arc = ArcFaceBackbone()
        id_apply = make_arcface_id_loss(
            lambda v, img: arc.apply(v, img), arc_vars)
    elif args.id_lambda > 0:
        print("WARNING: --arcface not given; disabling ID loss.")
        args.id_lambda = 0.0

    psp = PSPModel.create(cfg)
    latent_avg = psp.estimate_latent_avg(dec_params, jax.random.PRNGKey(1))

    ccfg = CoachConfig(
        max_steps=args.max_steps, batch_size=args.batch_size,
        learning_rate=args.learning_rate, optim_name=args.optim_name,
        lpips_lambda=args.lpips_lambda, id_lambda=args.id_lambda,
        l2_lambda=args.l2_lambda, w_norm_lambda=args.w_norm_lambda,
        use_fake_lambda=args.use_fake_lambda, fake_every=args.fake_every,
        val_interval=args.val_interval, save_interval=args.save_interval)

    init_fn, train_step, eval_step, fake_step = make_coach(
        cfg, ccfg, dec_params, lpips_params, id_apply, latent_avg)
    state = init_fn(jax.random.PRNGKey(2))

    train_src = ImageFolderSource(args.dataset_dir)
    val_src = ImageFolderSource(args.test_dataset_dir)
    train_iter = make_train_iterator(train_src, ccfg.batch_size, cfg.size)
    os.makedirs(args.exp_dir, exist_ok=True)

    # TensorBoard + stdout scalars (reference Coach board_interval
    # logging, coach_new.py:103-106,322-324); only materialized on the
    # log cadence so the hot loop never host-syncs.
    from transeditor_tpu.train.loop import MetricLogger
    logger = MetricLogger(os.path.join(args.exp_dir, "logs"), log_every=50)

    key = jax.random.PRNGKey(3)
    best_val = float("inf")
    for step in range(ccfg.max_steps):
        real = jnp.asarray(next(train_iter))
        state, logs, inv = train_step(state, real)
        if ccfg.use_fake_lambda > 0 and step % ccfg.fake_every == 0:
            state, fake_loss = fake_step(state, jax.random.fold_in(key, step))
        if step % 50 == 0:
            logger.log(step, logs)
        if step % ccfg.val_interval == 0:
            val_losses = []
            for i in range(0, min(len(val_src), 64), ccfg.batch_size):
                imgs = np.stack([val_src.get(j, cfg.size) for j in
                                 range(i, min(i + ccfg.batch_size,
                                              len(val_src)))])
                vimgs = jnp.asarray(imgs.astype(np.float32) / 127.5 - 1.0)
                vlogs, vinv = eval_step(state, vimgs)
                val_losses.append(float(vlogs["loss"]))
            val_loss = float(np.mean(val_losses))
            logger.log(step, {"val_loss": val_loss})
            grid = make_grid(np.concatenate(
                [np.asarray(vimgs, np.float32)[:4],
                 np.asarray(vinv, np.float32)[:4]]), nrow=4)
            save_png(os.path.join(args.exp_dir, f"val_{step:06d}.png"), grid)
            if val_loss < best_val:
                best_val = val_loss
                with ocp.StandardCheckpointer() as c:
                    c.save(os.path.abspath(
                        os.path.join(args.exp_dir, "best_model")), state,
                        force=True)
        if step % ccfg.save_interval == 0 and step > 0:
            with ocp.StandardCheckpointer() as c:
                # force: a rerun in the same exp_dir re-hits step
                # numbers; overwrite instead of crashing (torch.save
                # semantics, same rationale as io/checkpoint.py)
                c.save(os.path.abspath(
                    os.path.join(args.exp_dir, f"ckpt_{step:06d}")), state,
                    force=True)


if __name__ == "__main__":
    main()
