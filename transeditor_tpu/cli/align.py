"""Face-alignment CLI (the ``align_all_parallel.py`` analogue).

Usage:
  python -m transeditor_tpu.cli.align --root_path raw/ --out_path aligned/ \
      [--landmarks lm.npz | --predictor shape_predictor_68.dat] \
      [--output_size 256] [--num_workers 4]

Landmark sources, in priority order:
  * ``--landmarks``: an .npz mapping image filename -> [68, 2] array
    (precomputed by any detector — keeps this CLI dependency-free);
  * ``--predictor``: dlib shape-predictor weights (requires dlib).

Reference: ``pSp/scripts/align_all_parallel.py`` — same FFHQ recipe,
but with the landmark provider decoupled from the alignment math
(utils/face_align.py) and failures reported rather than swallowed.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from transeditor_tpu.utils.face_align import align_face, dlib_landmark_provider

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _align_one(job):
    src, dst, lm, output_size = job
    from PIL import Image
    img = np.asarray(Image.open(src).convert("RGB"))
    out = align_face(img, lm, output_size=output_size,
                     transform_size=output_size)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    Image.fromarray(out).save(dst)
    return dst


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", required=True)
    p.add_argument("--out_path", required=True)
    p.add_argument("--landmarks", type=str, default=None,
                   help=".npz of filename -> [68,2] landmark arrays")
    p.add_argument("--predictor", type=str, default=None,
                   help="dlib shape-predictor .dat (requires dlib)")
    p.add_argument("--output_size", type=int, default=256)
    p.add_argument("--num_workers", type=int, default=1)
    args = p.parse_args(argv)

    if args.landmarks is None and args.predictor is None:
        p.error("need --landmarks or --predictor")

    names = sorted(f for f in os.listdir(args.root_path)
                   if f.lower().endswith(IMG_EXTS))

    lm_db = None
    provider = None
    if args.landmarks:
        lm_db = np.load(args.landmarks)
    else:
        provider = dlib_landmark_provider(args.predictor)

    jobs, skipped = [], []
    for name in names:
        src = os.path.join(args.root_path, name)
        try:
            lm = (np.asarray(lm_db[name]) if lm_db is not None
                  else provider(src))
        except (KeyError, ValueError) as e:
            skipped.append((name, str(e)))
            continue
        jobs.append((src, os.path.join(args.out_path, name), lm,
                     args.output_size))

    if args.num_workers > 1:
        import multiprocessing as mp
        with mp.Pool(args.num_workers) as pool:
            done = pool.map(_align_one, jobs)
    else:
        done = [_align_one(j) for j in jobs]

    print(f"aligned {len(done)} images -> {args.out_path}")
    for name, why in skipped:
        print(f"skipped {name}: {why}")


if __name__ == "__main__":
    main()
