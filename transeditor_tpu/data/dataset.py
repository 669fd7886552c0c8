"""Input pipeline.

Reference data layer: ``utils/dataset.py`` (LMDB of pre-resized JPEGs,
keys ``f'{resolution}-{idx:05d}'``) + ``utils/dataset_projector.py``
(sorted image folder), sharded per-process by DistributedSampler.

TPU-native pipeline:
  * a ``Source`` abstraction (random-access decode of one image),
  * an infinite, shuffled, host-sharded iterator producing NHWC
    float32 batches in [-1, 1] with random horizontal flip
    (train_spatial_query.py:511-517 transform),
  * background double-buffered prefetch (thread) so host decode
    overlaps device compute,
  * per-host sharding = slice by (host_index, host_count) — the
    DistributedSampler analogue.

The LMDB source lives in ``transeditor_tpu.data.lmdb_reader`` (native
C-backed reader; no lmdb python dependency).
"""

from __future__ import annotations

import os
import threading
import queue as queue_lib
from typing import Iterator, Optional, Sequence

import numpy as np


class ArraySource:
    """In-memory source (tests, synthetic data). Array [N,H,W,3] uint8."""

    def __init__(self, array: np.ndarray):
        assert array.ndim == 4 and array.shape[-1] == 3
        self.array = array

    def __len__(self):
        return self.array.shape[0]

    def get(self, idx: int, resolution: int) -> np.ndarray:
        img = self.array[idx]
        if img.shape[0] != resolution:
            img = _resize_uint8(img, resolution)
        return img


class ImageFolderSource:
    """Sorted image folder (the dataset_projector.py analogue)."""

    EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

    def __init__(self, root: str):
        self.paths = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.lower().endswith(self.EXTS))
        if not self.paths:
            raise ValueError(f"no images under {root}")

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int, resolution: int) -> np.ndarray:
        from PIL import Image
        img = Image.open(self.paths[idx]).convert("RGB")
        if img.size != (resolution, resolution):
            img = img.resize((resolution, resolution), Image.LANCZOS)
        return np.asarray(img, dtype=np.uint8)


def _resize_uint8(img: np.ndarray, res: int) -> np.ndarray:
    from PIL import Image
    return np.asarray(
        Image.fromarray(img).resize((res, res), Image.LANCZOS),
        dtype=np.uint8)


def _to_train_batch(imgs: np.ndarray, flip_mask: np.ndarray) -> np.ndarray:
    """uint8 [B,H,W,3] -> float32 in [-1,1], random h-flip."""
    out = imgs.astype(np.float32) / 127.5 - 1.0
    out[flip_mask] = out[flip_mask, :, ::-1, :]
    return out


def make_train_iterator(
    source,
    batch_size: int,
    resolution: int,
    *,
    seed: int = 0,
    host_index: int = 0,
    host_count: int = 1,
    shuffle: bool = True,
    prefetch: int = 2,
    flip: bool = True,
    normalize: bool = True,
) -> Iterator[np.ndarray]:
    """Infinite host-sharded batch iterator with background prefetch.

    ``normalize=False`` yields flipped uint8 batches — ship those to the
    device and normalize there (4x less host->device traffic); the
    train step accepts either.
    """
    n = len(source)
    local_indices = np.arange(host_index, n, host_count)

    stop = threading.Event()

    def producer(out_q: queue_lib.Queue):
        rng = np.random.RandomState(seed + host_index)
        epoch_order = local_indices.copy()
        pos = len(epoch_order)  # trigger shuffle on first use
        while not stop.is_set():
            batch_idx = []
            while len(batch_idx) < batch_size:
                if pos >= len(epoch_order):
                    if shuffle:
                        rng.shuffle(epoch_order)
                    pos = 0
                batch_idx.append(int(epoch_order[pos]))
                pos += 1
            imgs = np.stack([source.get(i, resolution) for i in batch_idx])
            flips = (rng.rand(batch_size) < 0.5) if flip else \
                np.zeros(batch_size, bool)
            if normalize:
                item = _to_train_batch(imgs, flips)
            else:
                imgs[flips] = imgs[flips, :, ::-1, :]
                item = imgs
            # bounded put that honors stop: an abandoned iterator must
            # not leave this thread blocked on a full queue forever
            # (leaked producers accumulate across consumers and starve
            # the process's thread budget)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.25)
                    break
                except queue_lib.Full:
                    continue

    q: queue_lib.Queue = queue_lib.Queue(maxsize=prefetch)
    t = threading.Thread(target=producer, args=(q,), daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()  # generator closed/GC'd -> producer exits promptly
