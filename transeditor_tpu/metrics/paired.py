"""Folder-vs-folder paired image metrics: LPIPS / L2 / ID similarity.

TPU-native analogue of the reference's encoder-quality eval scripts:

* ``pSp/scripts/calc_losses_on_images.py:30-78`` — LPIPS (alex) or L2
  between a results folder and a ground-truth folder, pairing files by
  name via ``pSp/datasets/gt_res_dataset.py:13-18`` (a ``.png`` result
  falls back to the ``.jpg`` ground truth), mean +/- std over the set.
* ``pSp/scripts/calc_id_loss_parallel.py:28-119`` — IR-101
  (CurricularFace) embedding cosine between each result/gt pair,
  parallelised with a multiprocessing pool.

Reference runs ONE image per CUDA step (``:57-59``) / one process per
chunk; here every pair rides a single jitted fixed-shape batch program,
so the whole folder streams through the MXU without per-image dispatch.
The last partial batch is padded (scores for padding are dropped) —
unlike the reference's ``drop_last=True``, no file is silently skipped.

Face alignment: the reference aligns with its vendored MTCNN detector
(dead-weight torch subtree, see docs/PARITY.md). Here ``make_id_fn``
applies the deterministic ArcFace crop used by the training ID loss
(``pSp/criteria/id_loss.py:17-21``); images pre-aligned with
``cli/align.py`` (the FFHQ recipe) reproduce the reference geometry.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pair_folders", "load_pair_batch", "make_l2_fn", "make_lpips_fn",
    "make_id_fn", "paired_scores", "write_report",
]

_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def pair_folders(result_dir: str, gt_dir: str) -> List[Tuple[str, str]]:
    """Name-match images in ``result_dir`` to ``gt_dir``.

    Mirrors ``gt_res_dataset.py:13-18``: same filename first, then the
    reference's ``.png`` result -> ``.jpg`` ground-truth fallback (and,
    more robustly, any extension swap within _EXTS).
    """
    pairs = []
    for f in sorted(os.listdir(result_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() not in _EXTS:
            continue
        candidates = [f] + [stem + e for e in _EXTS if e != ext.lower()]
        for cand in candidates:
            gt = os.path.join(gt_dir, cand)
            if os.path.exists(gt):
                pairs.append((os.path.join(result_dir, f), gt))
                break
        else:
            raise FileNotFoundError(
                f"no ground-truth match for {f} under {gt_dir}")
    if not pairs:
        raise ValueError(f"no images under {result_dir}")
    return pairs


def _load_img(path: str, resolution: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if img.size != (resolution, resolution):
        # transforms.Resize((256,256)) in the reference (bilinear)
        img = img.resize((resolution, resolution), Image.BILINEAR)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def load_pair_batch(pairs: Sequence[Tuple[str, str]],
                    resolution: int) -> Tuple[np.ndarray, np.ndarray]:
    """[-1,1] float32 NHWC batches (results, ground truths)."""
    res = np.stack([_load_img(r, resolution) for r, _ in pairs])
    gt = np.stack([_load_img(g, resolution) for _, g in pairs])
    return res, gt


def make_l2_fn() -> Callable:
    """Per-pair MSE over all pixels/channels (torch ``MSELoss``)."""

    @jax.jit
    def l2(a, b):
        return jnp.mean((a - b) ** 2, axis=(1, 2, 3))

    return l2


def make_lpips_fn(lpips_params, net: str = "alex") -> Callable:
    """Per-pair LPIPS distance (``calc_losses_on_images.py:47``)."""
    from transeditor_tpu.zoo.lpips import LPIPS
    lpips = LPIPS(net=net)

    @jax.jit
    def fn(a, b):
        return lpips.apply(lpips_params, a, b)

    return fn


def make_id_fn(arc_apply: Callable, arc_vars) -> Callable:
    """Per-pair embedding cosine (``calc_id_loss_parallel.py:56-65``).

    ``arc_apply(vars, img112) -> [B,512]`` l2-normalised; the crop is
    the ID-loss alignment (id_loss.py:17-21) — see module docstring.
    """
    from transeditor_tpu.train.coach import face_crop, resize_112

    @jax.jit
    def fn(a, b):
        fa = arc_apply(arc_vars, resize_112(face_crop(a)))
        fb = arc_apply(arc_vars, resize_112(face_crop(b)))
        return jnp.sum(fa * fb, axis=-1)

    return fn


def paired_scores(score_fn: Callable,
                  pairs: Sequence[Tuple[str, str]],
                  resolution: int = 256,
                  batch_size: int = 8,
                  progress: bool = False) -> Dict[str, float]:
    """Run ``score_fn`` over all pairs -> {result basename: score}.

    Fixed-shape batches (last one padded) so exactly ONE program is
    compiled regardless of folder size.
    """
    scores: Dict[str, float] = {}
    for start in range(0, len(pairs), batch_size):
        chunk = list(pairs[start:start + batch_size])
        n = len(chunk)
        while len(chunk) < batch_size:       # pad to the static shape
            chunk.append(chunk[-1])
        a, b = load_pair_batch(chunk, resolution)
        vals = np.asarray(score_fn(jnp.asarray(a), jnp.asarray(b)))
        for (rpath, _), v in zip(chunk[:n], vals[:n]):
            scores[os.path.basename(rpath)] = float(v)
        if progress:
            print(f"  {min(start + batch_size, len(pairs))}/{len(pairs)}")
    return scores


def write_report(scores: Dict[str, float], out_dir: str,
                 mode: str) -> Tuple[float, float]:
    """Write ``stat_{mode}.txt`` + ``scores_{mode}.json`` exactly like
    the reference (``calc_losses_on_images.py:75-78``,
    ``calc_id_loss_parallel.py:110-114``); returns (mean, std)."""
    vals = list(scores.values())
    mean, std = float(np.mean(vals)), float(np.std(vals))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"stat_{mode}.txt"), "w") as f:
        f.write("Average loss is {:.2f}+-{:.2f}".format(mean, std)
                if mode != "id" else
                "New Average score is {:.2f}+-{:.2f}".format(mean, std))
    with open(os.path.join(out_dir, f"scores_{mode}.json"), "w") as f:
        json.dump(scores, f)
    return mean, std
