"""Value oracles for the optimization projector's auxiliary math.

The reference functions (projector_optimization.py:21-63 —
noise_regularize_, noise_normalize_, get_lr) are pure torch/math but
live in a module whose top-level imports need CUDA-era packages, so
the fixture extracts just those function defs via AST and execs them
with torch/math in scope.  Inputs are shared; outputs must match
(layouts: reference noise maps are NCHW, ours NHWC).
"""

import ast
import math

import numpy as np
import torch

from transeditor_tpu.invert.projector import (lr_schedule, noise_normalize,
                                              noise_regularize)

REF_FILE = "/root/reference/projector_optimization.py"
WANTED = {"noise_regularize_", "noise_normalize_", "get_lr"}


def _ref_functions():
    src = open(REF_FILE).read()
    tree = ast.parse(src)
    picked = [n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in WANTED]
    assert {n.name for n in picked} == WANTED
    ns = {"torch": torch, "math": math}
    exec(compile(ast.Module(body=picked, type_ignores=[]),
                 REF_FILE, "exec"), ns)
    return ns


def _noise_maps(seed):
    """Reference-shaped noise pyramid: 4x4 then two maps per octave."""
    g = torch.Generator().manual_seed(seed)
    shapes = [(2, 1, 4, 4), (2, 1, 8, 8), (2, 1, 8, 8),
              (2, 1, 16, 16), (2, 1, 16, 16), (2, 1, 32, 32)]
    return [torch.randn(s, generator=g) for s in shapes]


def _nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def test_noise_regularize_oracle():
    ref = _ref_functions()
    noises = _noise_maps(0)
    want = float(ref["noise_regularize_"](noises))
    got = float(noise_regularize([_nhwc(t) for t in noises]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_noise_normalize_oracle():
    """In-place in the reference; ours is functional.  torch .std() is
    unbiased (ddof=1) — this pins that, especially on the 4x4 map."""
    ref = _ref_functions()
    noises = _noise_maps(1)
    ours_in = [_nhwc(t) for t in noises]
    ref["noise_normalize_"](noises)            # mutates
    got = noise_normalize(ours_in)
    for want_t, got_a in zip(noises, got):
        np.testing.assert_allclose(np.asarray(got_a),
                                   _nhwc(want_t), rtol=1e-5, atol=1e-6)


def test_get_lr_oracle():
    ref = _ref_functions()
    total = 1000
    for step in (0, 10, 49, 50, 250, 500, 749, 750, 900, 999):
        want = ref["get_lr"](step / total, 0.1)
        got = float(lr_schedule(step, total, 0.1))
        # ours evaluates in float32; the schedule shape is what matters
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-9)
