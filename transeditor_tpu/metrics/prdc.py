"""Precision / Recall / Density / Coverage (reference metrics/prdc.py:
54-96, k=3 protocol at calc_prdc.py:78).

Manifold estimation via k-NN radii.  The reference materialises three
dense [N, N] distance matrices (sklearn pairwise_distances) — at the
50k-sample protocol that is ~60 GB of host RAM.  This implementation
streams row CHUNKS of each matrix instead: every chunk is one
[chunk, D] x [D, N] matmul (MXU work under jit) followed by a row
reduction, so peak memory is O(row_chunk * N) and the full protocol
runs on-device.

Semantics match the reference exactly up to float noise:
  * radii = distance to the k-th nearest OTHER point.  The reference
    takes the (k+1)-th smallest of a row that includes the self
    distance 0 (get_kth_value(..., k=nearest_k+1)); we take index k of
    the ascending row, which is the same element.
  * all ball-membership comparisons are strict ``<`` on squared
    distances — monotonically identical to the reference's ``<`` on
    euclidean distances (both sides non-negative).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sq_dists(rows, x, x_sq):
    """|rows_i - x_j|^2 via the matmul expansion (HIGHEST precision:
    this is a metric, and TPU f32 matmuls otherwise downcast)."""
    r_sq = jnp.sum(rows * rows, axis=1)
    d = (r_sq[:, None] + x_sq[None, :]
         - 2.0 * jnp.matmul(rows, x.T,
                            precision=jax.lax.Precision.HIGHEST))
    return jnp.maximum(d, 0.0)


def _row_chunks(x: np.ndarray, chunk: int, fill: float = 0.0):
    """[N, ...] -> [m, chunk, ...] with `fill`-padded tail rows."""
    pad = (-len(x)) % chunk
    if pad:
        x = np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x.reshape((-1, chunk) + x.shape[1:])


@partial(jax.jit, static_argnames=("k",))
def _knn_sq_radii(chunks, x, k):
    """Squared k-NN radius of every row of `chunks` among the points
    `x` (rows are a chunked copy of x; self-distance 0 sorts first)."""
    x_sq = jnp.sum(x * x, axis=1)

    def body(_, rows):
        d = _sq_dists(rows, x, x_sq)
        neg_topk, _ = jax.lax.top_k(-d, k + 1)
        return None, -neg_topk[:, k]

    _, radii = jax.lax.scan(body, None, chunks)
    return radii.reshape(-1)


@jax.jit
def _cross_pass(real_chunks, real_sq_radii_chunks, fake, fake_sq_radii):
    """One streamed pass over the real x fake distance matrix.

    Returns (per-fake contained-in-any-real-ball, per-fake count of
    containing real balls, per-real inside-any-fake-ball, per-real
    nearest-fake-within-own-radius) — everything PRDC needs.  Padded
    real rows carry radius -1, so they contain nothing; their recall /
    coverage rows are sliced off by the caller.
    """
    fake_sq = jnp.sum(fake * fake, axis=1)
    n_fake = fake.shape[0]

    def body(carry, inp):
        rows, rrad = inp
        d = _sq_dists(rows, fake, fake_sq)            # [chunk, Nf]
        contains = d < rrad[:, None]                  # real ball i ∋ fake j
        prec = carry[0] | jnp.any(contains, axis=0)
        dens = carry[1] + jnp.sum(contains.astype(jnp.int32), axis=0)
        recall_rows = jnp.any(d < fake_sq_radii[None, :], axis=1)
        cover_rows = jnp.min(d, axis=1) < rrad
        return (prec, dens), (recall_rows, cover_rows)

    init = (jnp.zeros((n_fake,), bool), jnp.zeros((n_fake,), jnp.int32))
    (prec, dens), (recall, cover) = jax.lax.scan(
        body, init, (real_chunks, real_sq_radii_chunks))
    return prec, dens, recall.reshape(-1), cover.reshape(-1)


def compute_prdc(real_features: np.ndarray, fake_features: np.ndarray,
                 nearest_k: int = 3, row_chunk: int = 2048) -> dict:
    """Returns dict(precision, recall, density, coverage)."""
    real = np.asarray(real_features, np.float32)
    fake = np.asarray(fake_features, np.float32)
    n_real, n_fake = len(real), len(fake)
    chunk = int(max(1, min(row_chunk, n_real, n_fake)))

    real_d = jnp.asarray(real)
    fake_d = jnp.asarray(fake)
    real_radii = np.asarray(_knn_sq_radii(
        jnp.asarray(_row_chunks(real, chunk)), real_d, nearest_k))[:n_real]
    fake_sq_radii = _knn_sq_radii(
        jnp.asarray(_row_chunks(fake, chunk)), fake_d, nearest_k)[:n_fake]

    prec, dens, recall, cover = _cross_pass(
        jnp.asarray(_row_chunks(real, chunk)),
        jnp.asarray(_row_chunks(real_radii, chunk, fill=-1.0)),
        fake_d, fake_sq_radii)

    recall = np.asarray(recall)[:n_real]
    cover = np.asarray(cover)[:n_real]
    return dict(
        precision=float(np.asarray(prec).mean()),
        recall=float(recall.mean()),
        density=float(np.asarray(dens).mean() / nearest_k),
        coverage=float(cover.mean()),
    )
