"""Precompute real-data FID statistics (the metrics/calc_inception.py
analogue): InceptionV3 pool3 mean/cov over up to 50k dataset images,
pickled for the evaluator.

Usage:
  python -m transeditor_tpu.cli.calc_stats --data_dir imgs_or_lmdb \
      --out inception_ffhq.pkl --size 256 \
      --inception_weights pt_inception.pth [--n_samples 50000]
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_samples", type=int, default=50_000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--inception_weights", type=str, default=None)
    args = p.parse_args(argv)

    from transeditor_tpu.metrics.evaluator import real_stats_from_source
    from transeditor_tpu.metrics.inception import (
        InceptionV3Features, port_fid_inception_weights)

    if os.path.isdir(args.data_dir) and os.path.exists(
            os.path.join(args.data_dir, "data.mdb")):
        from transeditor_tpu.data.native import NativeLMDBSource
        source = NativeLMDBSource(args.data_dir)
    else:
        from transeditor_tpu.data.dataset import ImageFolderSource
        source = ImageFolderSource(args.data_dir)

    if args.inception_weights:
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        params = port_fid_inception_weights(
            load_torch_checkpoint(args.inception_weights))
    else:
        print("WARNING: random InceptionV3 (pass --inception_weights)")
        params = InceptionV3Features().init(jax.random.PRNGKey(0),
                                            jnp.zeros((1, 64, 64, 3)))

    mean, cov = real_stats_from_source(source, params, args.size,
                                       n_samples=args.n_samples,
                                       batch=args.batch)
    with open(args.out, "wb") as f:
        pickle.dump({"mean": mean, "cov": cov,
                     "n": min(args.n_samples, len(source))}, f)
    print(f"wrote stats for {min(args.n_samples, len(source))} images "
          f"to {args.out}")


if __name__ == "__main__":
    main()
