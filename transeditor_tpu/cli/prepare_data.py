"""Dataset preparation: image folder -> LMDB of pre-resized JPEGs.

Produces the MultiResolutionDataset layout the training pipeline (and
the reference's utils/dataset.py) consumes: keys ``f'{res}-{idx:05d}'``
holding JPEG bytes plus a ``length`` record.

Usage:
  python -m transeditor_tpu.cli.prepare_data --in_dir imgs/ \
      --out data/ffhq_lmdb --size 256 [--quality 95]
"""

from __future__ import annotations

import argparse
import io
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--in_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--quality", type=int, default=95)
    args = p.parse_args(argv)

    from PIL import Image
    from transeditor_tpu.data.dataset import ImageFolderSource
    from transeditor_tpu.data.lmdb_writer import write_image_dataset

    source = ImageFolderSource(args.in_dir)

    def jpegs():
        for i in range(len(source)):
            img = source.get(i, args.size)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG",
                                      quality=args.quality)
            yield buf.getvalue()
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(source)}", flush=True)

    n = write_image_dataset(args.out, jpegs(), args.size)
    print(f"wrote {n} images at {args.size}px to {args.out}")


if __name__ == "__main__":
    main()
