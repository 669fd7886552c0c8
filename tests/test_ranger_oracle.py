"""Trajectory oracle: our optax Ranger vs the reference torch Ranger.

The reference pSp coach trains with Ranger (pSp/training/ranger.py:30-
165 — RAdam + Lookahead + gradient centralization).  Ours is an optax
composition (train/ranger.py), documented as an equivalence rather
than a port — this test pins that equivalence by feeding both
optimizers the SAME gradient sequence and requiring matching parameter
trajectories across the RAdam warmup (unrectified -> rectified
transition near step 6) and two Lookahead syncs (k=6: steps 6, 12).

Layout note: torch centralizes over all-but-dim-0 (output first),
ours over all-but-last (output last) — 2-D params are transposed
between the two sides, which makes the GC statistic identical.

Known tiny deviation: torch adds eps to sqrt(raw second moment) while
optax adds it to sqrt(bias-corrected) — an O(eps·(1/sqrt(1-b2^t)-1))
per-step difference; tolerances here bound it.
"""

import importlib.util

import numpy as np
import optax
import torch

from transeditor_tpu.train.ranger import ranger, ranger_simple

REF_RANGER = "/root/reference/pSp/training/ranger.py"
LR = 0.01
STEPS = 20


def _ref_ranger_module():
    spec = importlib.util.spec_from_file_location("ref_ranger", REF_RANGER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad_sequence(seed):
    g = torch.Generator().manual_seed(seed)
    return [(torch.randn((4, 3), generator=g),
             torch.randn((5,), generator=g)) for _ in range(STEPS)]


def _run_torch(k, use_gc=True):
    mod = _ref_ranger_module()
    g = torch.Generator().manual_seed(0)
    w = torch.nn.Parameter(torch.randn((4, 3), generator=g))
    b = torch.nn.Parameter(torch.randn((5,), generator=g))
    w0, b0 = w.detach().clone(), b.detach().clone()
    opt = mod.Ranger([w, b], lr=LR, k=k, use_gc=use_gc)
    traj = []
    for gw, gb in _grad_sequence(1):
        w.grad, b.grad = gw.clone(), gb.clone()
        opt.step()
        traj.append((w.detach().numpy().copy(),
                     b.detach().numpy().copy()))
    return (w0.numpy(), b0.numpy()), traj


def _params_from(w0, b0):
    return {"w": np.ascontiguousarray(w0.T), "b": b0.copy()}


def test_ranger_simple_matches_reference_radam_gc():
    """RAdam+GC core (the coach's ranger_simple): reference with k
    huge so Lookahead never syncs within the run."""
    (w0, b0), want = _run_torch(k=10_000)
    params = _params_from(w0, b0)
    opt = ranger_simple(LR)
    state = opt.init(params)
    for t, (gw, gb) in enumerate(_grad_sequence(1)):
        grads = {"w": np.ascontiguousarray(gw.numpy().T),
                 "b": gb.numpy()}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        if t in (0, 4, 6, 11, STEPS - 1):   # warmup, transition, tail
            np.testing.assert_allclose(np.asarray(params["w"]).T,
                                       want[t][0], rtol=2e-3, atol=2e-5)
            np.testing.assert_allclose(np.asarray(params["b"]),
                                       want[t][1], rtol=2e-3, atol=2e-5)


def test_ranger_lookahead_matches_reference():
    """Full Ranger incl. Lookahead syncs at steps 6 and 12 (k=6)."""
    (w0, b0), want = _run_torch(k=6)
    fast = _params_from(w0, b0)
    lp = optax.LookaheadParams(fast=fast, slow=fast)
    opt = ranger(LR, k=6, alpha=0.5)
    state = opt.init(fast)
    for t, (gw, gb) in enumerate(_grad_sequence(1)):
        grads = {"w": np.ascontiguousarray(gw.numpy().T),
                 "b": gb.numpy()}
        updates, state = opt.update(grads, state, lp)
        lp = optax.apply_updates(lp, updates)
        if t in (4, 5, 6, 11, 12, STEPS - 1):  # around both syncs
            np.testing.assert_allclose(np.asarray(lp.fast["w"]).T,
                                       want[t][0], rtol=2e-3, atol=2e-5)
            np.testing.assert_allclose(np.asarray(lp.fast["b"]),
                                       want[t][1], rtol=2e-3, atol=2e-5)


def test_reference_use_gc_flag_is_dead():
    """The reference stores ``self.use_gc`` but never reads it in
    step() (ranger.py:71,118) — GC applies unconditionally to every
    dim>1 grad, so use_gc=False is a no-op there.  Ours honours the
    flag; the coach only ever uses the default use_gc=True, where the
    trajectory oracles above prove equivalence.  This test documents
    the reference bug so nobody "fixes" our flag to mimic it."""
    _, with_gc = _run_torch(k=10_000, use_gc=True)
    _, without = _run_torch(k=10_000, use_gc=False)
    np.testing.assert_array_equal(with_gc[-1][0], without[-1][0])
    np.testing.assert_array_equal(with_gc[-1][1], without[-1][1])
