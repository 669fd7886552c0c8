"""Checkpoint evaluation CLI (the metrics/evaluate_query.py analogue).

Usage:
  python -m transeditor_tpu.cli.evaluate --ckpt out/run/checkpoint/790000.pt \
      --fid --inception_stats inception_ffhq.pkl \
      --inception_weights pt_inception.pth \
      [--lpips --lpips_weights lpips_alex.pt] \
      [--ppl --ppl_lpips_weights lpips_vgg.pt] [--dataset ffhq]

With --ckpt_dir, evaluates every checkpoint and reports the best FID
(reference :383-391).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp

from transeditor_tpu.io.checkpoint import load_reference_generator
from transeditor_tpu.metrics.evaluator import (evaluate_checkpoint,
                                               load_real_stats)
from transeditor_tpu.metrics.inception import (InceptionV3Features,
                                               port_fid_inception_weights)
from transeditor_tpu.zoo.lpips import LPIPS, load_lpips_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dataset", type=str, default="ffhq",
                   choices=["ffhq", "celeba_hq"])
    p.add_argument("--fid", action="store_true")
    p.add_argument("--lpips", action="store_true")
    p.add_argument("--ppl", action="store_true")
    p.add_argument("--prdc", action="store_true")
    p.add_argument("--real_data", type=str, default=None,
                   help="real image folder/LMDB (needed for --prdc)")
    p.add_argument("--vgg16_weights", type=str, default=None)
    p.add_argument("--prdc_samples", type=int, default=50_000)
    p.add_argument("--fid_samples", type=int, default=None)
    p.add_argument("--lpips_batches", type=int, default=1000)
    p.add_argument("--ppl_samples", type=int, default=10_000)
    p.add_argument("--ppl_slerp", action="store_true",
                   help="spherical interpolation in PPL "
                        "(evaluate_query.py use_slerp)")
    p.add_argument("--inception_stats", type=str, default=None)
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="AlexNet LPIPS ckpt for the diversity metric")
    p.add_argument("--lpips_backbone", type=str, default=None,
                   help="torchvision alexnet state dict when "
                        "--lpips_weights is heads-only")
    p.add_argument("--ppl_lpips_weights", type=str, default=None,
                   help="richzhang net-lin VGG ckpt for PPL")
    p.add_argument("--ppl_lpips_backbone", type=str, default=None,
                   help="torchvision vgg16 state dict when "
                        "--ppl_lpips_weights is heads-only")
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(p, dtype_default="bfloat16")
    args = p.parse_args(argv)

    cfg = model_config_from_args(args)
    # reference protocol: 69k samples FFHQ / 29k CelebA-HQ (:55-60)
    fid_samples = args.fid_samples or (69_000 if args.dataset == "ffhq"
                                       else 29_000)

    inception_params = real_stats = None
    if args.fid:
        assert args.inception_stats, "--fid needs --inception_stats"
        real_stats = load_real_stats(args.inception_stats)
        inception = InceptionV3Features()
        if args.inception_weights:
            from transeditor_tpu.io.torch_port import load_torch_checkpoint
            inception_params = port_fid_inception_weights(
                load_torch_checkpoint(args.inception_weights))
        else:
            print("WARNING: random InceptionV3 (pass --inception_weights)")
            inception_params = inception.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # two different perceptual nets, per the reference protocol:
    # diversity scores with AlexNet LPIPS (evaluate_query.py:97), PPL
    # with richzhang net-lin VGG (:139-140)
    x0 = jnp.zeros((1, cfg.size, cfg.size, 3))

    def _backbone_sd(path):
        if not path:
            return None
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        return load_torch_checkpoint(path)

    lpips_params = ppl_lpips_params = None
    if args.lpips:
        if args.lpips_weights:
            from transeditor_tpu.io.torch_port import load_torch_checkpoint
            lpips_params = load_lpips_params(
                load_torch_checkpoint(args.lpips_weights), net="alex",
                backbone_sd=_backbone_sd(args.lpips_backbone))
        else:
            print("WARNING: random alex-LPIPS (pass --lpips_weights)")
            lpips_params = LPIPS(net="alex").init(
                jax.random.PRNGKey(1), x0, x0)
    if args.ppl:
        if args.ppl_lpips_weights:
            from transeditor_tpu.io.torch_port import load_torch_checkpoint
            ppl_lpips_params = load_lpips_params(
                load_torch_checkpoint(args.ppl_lpips_weights), net="vgg",
                backbone_sd=_backbone_sd(args.ppl_lpips_backbone))
        else:
            print("WARNING: random vgg-LPIPS (pass --ppl_lpips_weights)")
            ppl_lpips_params = LPIPS(net="vgg").init(
                jax.random.PRNGKey(2), x0, x0)

    ckpts = [args.ckpt] if args.ckpt else sorted(
        glob.glob(os.path.join(args.ckpt_dir, "*.pt")))
    best_fid, best_ckpt = float("inf"), None
    results = []
    for ck in ckpts:
        gen_params = load_reference_generator(ck, cfg)
        report = evaluate_checkpoint(
            cfg, gen_params,
            inception_params=inception_params, real_stats=real_stats,
            lpips_params=lpips_params,
            ppl_lpips_params=ppl_lpips_params, do_fid=args.fid,
            do_lpips=args.lpips, do_ppl=args.ppl,
            fid_samples=fid_samples, lpips_batches=args.lpips_batches,
            ppl_samples=args.ppl_samples, batch=args.batch,
            ppl_slerp=args.ppl_slerp)
        out = {"ckpt": ck, "fid": report.fid, "lpips": report.lpips,
               "ppl": report.ppl}
        if args.prdc:
            assert args.real_data, "--prdc needs --real_data"
            from transeditor_tpu.metrics.evaluator import evaluate_prdc
            from transeditor_tpu.zoo.backbones import (VGG16Fc7,
                                                       port_vgg16_fc7)
            if os.path.exists(os.path.join(args.real_data, "data.mdb")):
                from transeditor_tpu.data.native import NativeLMDBSource
                src = NativeLMDBSource(args.real_data)
            else:
                from transeditor_tpu.data.dataset import ImageFolderSource
                src = ImageFolderSource(args.real_data)
            if args.vgg16_weights:
                from transeditor_tpu.io.torch_port import \
                    load_torch_checkpoint
                vgg_params = port_vgg16_fc7(
                    load_torch_checkpoint(args.vgg16_weights))
            else:
                print("WARNING: random VGG16 (pass --vgg16_weights)")
                vgg_params = VGG16Fc7().init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
            out["prdc"] = evaluate_prdc(cfg, gen_params, vgg_params, src,
                                        n_samples=args.prdc_samples,
                                        batch=args.batch)
            print(json.dumps({"prdc": out["prdc"]}), flush=True)
        print(json.dumps(out), flush=True)
        results.append(out)
        if report.fid is not None and report.fid < best_fid:
            best_fid, best_ckpt = report.fid, ck
    if args.fid and len(ckpts) > 1:
        print(json.dumps({"best_fid": best_fid, "best_ckpt": best_ckpt}))
    return results


if __name__ == "__main__":
    main()
