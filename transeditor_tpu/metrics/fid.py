"""FID: feature statistics + Fréchet distance.

Reference protocol (metrics/fid_query.py:23-68, evaluate_query.py:47-78):
sample N images from g_ema (69k FFHQ / 29k CelebA-HQ), extract
InceptionV3 pool3 features (2048-d), compare (mean, cov) to cached real
stats via the Fréchet distance with a scipy sqrtm.

The feature extractor lives in metrics/inception.py (Flax port); this
module is extractor-agnostic.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


def compute_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mean, covariance) of [N, D] features (float64)."""
    feats = np.asarray(features, np.float64)
    mean = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mean, cov


def frechet_distance(mean1, cov1, mean2, cov2, eps: float = 1e-6) -> float:
    """d² = |m1-m2|² + Tr(C1 + C2 - 2·sqrtm(C1·C2))  (fid_query.py:45-68)."""
    import scipy.linalg

    mean1, mean2 = np.asarray(mean1), np.asarray(mean2)
    cov1, cov2 = np.asarray(cov1), np.asarray(cov2)

    cc, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(cc).all():
        # regularise singular covariances, as pytorch-fid does
        offset = np.eye(cov1.shape[0]) * eps
        cc, _ = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset),
                                   disp=False)
    if np.iscomplexobj(cc):
        # fid_query.py:53-58: a materially imaginary sqrtm means the
        # stats are bad — fail loudly rather than report a wrong FID
        if not np.allclose(np.diagonal(cc).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(cc.imag))}")
        cc = cc.real
    diff = mean1 - mean2
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(cc))


def fid_from_features(gen_features: np.ndarray, real_mean, real_cov) -> float:
    mean, cov = compute_stats(gen_features)
    return frechet_distance(mean, cov, real_mean, real_cov)


def features_from_sampler(
    sample_batch: Callable[[int], np.ndarray],
    extract: Callable[[np.ndarray], np.ndarray],
    n_samples: int,
    batch_size: int = 64,
) -> np.ndarray:
    """Fan out generation+extraction over batches; returns [N, D]."""
    feats = []
    done = 0
    i = 0
    while done < n_samples:
        b = min(batch_size, n_samples - done)
        imgs = sample_batch(i)[:b]
        feats.append(np.asarray(extract(imgs)))
        done += b
        i += 1
    return np.concatenate(feats)[:n_samples]
