"""Trajectory oracle: the GAN's optax Adam vs the reference torch Adam.

The 800k-iteration recipe trains with ``optim.Adam(lr * ratio,
betas=(0 ** ratio, 0.99 ** ratio))`` where ratio is the lazy-reg
duty-cycle correction (``/root/reference/train_spatial_query.py:461-473``).
Ours is ``optax.adam`` built by ``train.gan.make_optimizers``.  The two
are believed mathematically identical (both apply eps OUTSIDE the
square root of the bias-corrected second moment: torch's
``denom = sqrt(v)/sqrt(bc2) + eps`` against optax's
``sqrt(v/bc2 + eps_root) + eps`` with ``eps_root=0``) — this test pins
the equivalence the Ranger-oracle way: feed both optimizers the SAME
recorded gradient sequence and require matching parameter trajectories
through the bias-correction warmup (the b2^t ramp is where an eps- or
bc-placement drift would show) and across a double-update step (the
lazy-reg cadence calls ``opt.update`` twice in one iteration: loss
grads then penalty grads, train/gan.py:262-278).
"""

import numpy as np
import optax
import torch

from transeditor_tpu.config import TrainConfig
from transeditor_tpu.train.gan import make_optimizers

STEPS = 30
SHAPES = {"w": (8, 4), "b": (16,), "mod": (1, 32)}


def _grad_sequence(seed, scale=1.0):
    g = torch.Generator().manual_seed(seed)
    seq = []
    for t in range(STEPS):
        step = {k: torch.randn(s, generator=g) * scale
                for k, s in SHAPES.items()}
        if t in (3, 11):            # a zero-grad update mixed in
            step = {k: torch.zeros_like(v) for k, v in step.items()}
        seq.append(step)
    return seq


def _init_params(seed=0):
    g = torch.Generator().manual_seed(seed)
    return {k: torch.randn(s, generator=g) for k, s in SHAPES.items()}


def _run_torch(lr, betas, grads, double_every=None):
    params = {k: torch.nn.Parameter(v.clone())
              for k, v in _init_params().items()}
    opt = torch.optim.Adam(params.values(), lr=lr, betas=betas)
    traj = []
    for t, gstep in enumerate(grads):
        for k, p in params.items():
            p.grad = gstep[k].clone()
        opt.step()
        if double_every and (t + 1) % double_every == 0:
            # the lazy-reg second update of the same iteration reuses
            # the SAME moment buffers (reference :195-208 d_optim.step()
            # after the R1 backward)
            for k, p in params.items():
                p.grad = (0.5 * gstep[k]).clone()
            opt.step()
        traj.append({k: p.detach().numpy().copy()
                     for k, p in params.items()})
    return traj


def _run_optax(opt, grads, double_every=None):
    params = {k: v.numpy().copy() for k, v in _init_params().items()}
    state = opt.init(params)
    traj = []
    for t, gstep in enumerate(grads):
        g_np = {k: v.numpy() for k, v in gstep.items()}
        updates, state = opt.update(g_np, state, params)
        params = optax.apply_updates(params, updates)
        if double_every and (t + 1) % double_every == 0:
            g2 = {k: 0.5 * v for k, v in g_np.items()}
            updates, state = opt.update(g2, state, params)
            params = optax.apply_updates(params, updates)
        traj.append({k: np.asarray(v).copy() for k, v in params.items()})
    return traj


def _assert_traj_close(got, want, checkpoints):
    for t in checkpoints:
        for k in SHAPES:
            np.testing.assert_allclose(
                got[t][k], want[t][k], rtol=3e-5, atol=3e-6,
                err_msg=f"step {t} param {k}")


def test_g_adam_matches_reference_trajectory():
    """G optimizer: ratio = 4/5 (g_reg_every=4) — b1 = 0**0.8 = 0."""
    tcfg = TrainConfig()
    g_opt, _ = make_optimizers(tcfg)
    ratio = tcfg.g_reg_every / (tcfg.g_reg_every + 1)
    grads = _grad_sequence(1)
    want = _run_torch(tcfg.lr * ratio, (0.0 ** ratio, 0.99 ** ratio), grads)
    got = _run_optax(g_opt, grads)
    _assert_traj_close(got, want, (0, 1, 3, 4, 11, 12, STEPS - 1))


def test_d_adam_matches_reference_trajectory_with_double_updates():
    """D optimizer: ratio = 16/17, plus the lazy-R1 cadence's second
    ``update`` on shared moment state every 4th iteration."""
    tcfg = TrainConfig()
    _, d_opt = make_optimizers(tcfg)
    ratio = tcfg.d_reg_every / (tcfg.d_reg_every + 1)
    grads = _grad_sequence(2, scale=3.0)
    want = _run_torch(tcfg.lr * ratio, (0.0 ** ratio, 0.99 ** ratio),
                      grads, double_every=4)
    got = _run_optax(d_opt, grads, double_every=4)
    _assert_traj_close(got, want, (0, 3, 4, 7, 15, 16, STEPS - 1))


def test_adam_warmup_is_where_drift_would_show():
    """Meta-check: with a deliberately wrong eps placement
    (eps_root=1e-8 inside the sqrt, eps=0) the same comparison FAILS in
    the first steps — i.e. the tolerance above genuinely discriminates
    the bias-correction/eps geometry rather than passing vacuously."""
    tcfg = TrainConfig()
    ratio = tcfg.g_reg_every / (tcfg.g_reg_every + 1)
    wrong = optax.adam(tcfg.lr * ratio, b1=0.0 ** ratio,
                       b2=0.99 ** ratio, eps=0.0, eps_root=1e-8)
    grads = _grad_sequence(3, scale=1e-3)   # small grads amplify eps
    want = _run_torch(tcfg.lr * ratio, (0.0 ** ratio, 0.99 ** ratio), grads)
    got = _run_optax(wrong, grads)
    try:
        _assert_traj_close(got, want, (0, 1))
    except AssertionError:
        return
    raise AssertionError("oracle tolerance failed to discriminate a "
                         "wrong eps placement — tighten it")
