"""Exact oracle for the Fréchet-distance math vs the reference.

The reference computes FID in ``metrics/fid_query.py::calc_fid``
(:45-68): scipy sqrtm of the covariance product, an eps-eye retry when
the first sqrtm is non-finite, a hard ValueError when the sqrtm has a
materially imaginary diagonal (atol 1e-3), and the usual
|Δμ|² + Tr(C1+C2-2·sqrtm(C1·C2)).

``calc_fid`` itself is pure numpy/scipy, but its module imports torch /
tensorboard / the CUDA model at top level — so we lift just the
function's source with ast and exec it, running the reference's actual
code as the oracle.
"""

import ast

import numpy as np
import pytest

from transeditor_tpu.metrics.fid import compute_stats, frechet_distance

REF_FID_QUERY = "/root/reference/metrics/fid_query.py"


def _load_reference_calc_fid():
    src = open(REF_FID_QUERY).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "calc_fid")
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"np": np}
    from scipy import linalg
    ns["linalg"] = linalg
    exec(compile(mod, REF_FID_QUERY, "exec"), ns)
    return ns["calc_fid"]


def _random_stats(rng, d=24, n=200):
    feats = rng.standard_normal((n, d))
    return compute_stats(feats)


def test_fid_matches_reference_well_conditioned():
    calc_fid = _load_reference_calc_fid()
    rng = np.random.default_rng(0)
    for _ in range(3):
        m1, c1 = _random_stats(rng)
        m2, c2 = _random_stats(rng)
        ref = calc_fid(m1, c1, m2, c2)
        ours = frechet_distance(m1, c1, m2, c2)
        assert np.isclose(ours, ref, rtol=1e-10), (ours, ref)


def test_fid_matches_reference_identical_stats():
    calc_fid = _load_reference_calc_fid()
    rng = np.random.default_rng(1)
    m, c = _random_stats(rng)
    ref = calc_fid(m, c, m.copy(), c.copy())
    ours = frechet_distance(m, c, m.copy(), c.copy())
    assert np.isclose(ours, ref, rtol=1e-8, atol=1e-8)
    assert abs(ours) < 1e-6


def test_fid_matches_reference_singular_covariance():
    # rank-deficient covariances (n < d) exercise the branching around
    # the first sqrtm; both implementations must take the same branch
    # and agree on the result.
    calc_fid = _load_reference_calc_fid()
    rng = np.random.default_rng(2)
    m1, c1 = _random_stats(rng, d=32, n=8)
    m2, c2 = _random_stats(rng, d=32, n=8)
    ref = calc_fid(m1, c1, m2, c2)
    ours = frechet_distance(m1, c1, m2, c2)
    assert np.isclose(ours, ref, rtol=1e-8), (ours, ref)


def test_fid_raises_on_materially_imaginary_sqrtm():
    # A negative eigenvalue in the product leaves no real square root
    # (sqrtm(diag(-1,1,..)) = diag(i,1,..)): the reference raises
    # ValueError on the materially imaginary diagonal
    # (fid_query.py:54-58) and so must we.
    calc_fid = _load_reference_calc_fid()
    d = 4
    neg = np.diag([-1.0, 1.0, 1.0, 1.0])
    eye = np.eye(d)
    mean = np.zeros(d)
    with pytest.raises(ValueError):
        calc_fid(mean, neg, mean, eye)
    with pytest.raises(ValueError):
        frechet_distance(mean, neg, mean, eye)
