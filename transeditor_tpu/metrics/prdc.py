"""Precision / Recall / Density / Coverage (reference metrics/prdc.py:54-96).

Manifold estimation via k-NN radii (k=3 in the reference protocol,
calc_prdc.py:78).  TPU-native: the pairwise-distance matrices are plain
matmuls, so for large N this runs as jitted [N,D]x[D,M] blocks on
device; the small-N path below is NumPy for simplicity.
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """|a_i - b_j|² via the matmul expansion."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    aa = (a * a).sum(1)[:, None]
    bb = (b * b).sum(1)[None, :]
    d = aa + bb - 2.0 * (a @ b.T)
    return np.maximum(d, 0.0)


def _kth_radius(dists: np.ndarray, k: int) -> np.ndarray:
    """Distance to the k-th nearest OTHER point (diagonal excluded by
    taking index k of the sorted row, since self-distance 0 is first)."""
    part = np.partition(dists, k, axis=1)
    return np.sqrt(part[:, k])


def compute_prdc(real_features: np.ndarray, fake_features: np.ndarray,
                 nearest_k: int = 3) -> dict:
    """Returns dict(precision, recall, density, coverage)."""
    rr = _pairwise_sq_dists(real_features, real_features)
    ff = _pairwise_sq_dists(fake_features, fake_features)
    rf = np.sqrt(_pairwise_sq_dists(real_features, fake_features))

    real_radii = _kth_radius(rr, nearest_k)   # [Nr]
    fake_radii = _kth_radius(ff, nearest_k)   # [Nf]

    # precision: fraction of fakes inside ANY real ball
    precision = float((rf < real_radii[:, None]).any(axis=0).mean())
    # recall: fraction of reals inside ANY fake ball
    recall = float((rf < fake_radii[None, :]).any(axis=1).mean())
    # density: average number of real balls containing each fake, / k
    density = float((rf < real_radii[:, None]).sum(axis=0).mean()
                    / nearest_k)
    # coverage: fraction of reals whose nearest fake is within the
    # real's k-NN radius
    coverage = float((rf.min(axis=1) < real_radii).mean())
    return dict(precision=precision, recall=recall, density=density,
                coverage=coverage)
