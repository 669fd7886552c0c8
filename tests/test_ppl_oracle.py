"""PPL protocol oracle: the reference's OWN ``evaluate_ppl`` run as-is
(torch-CPU) vs ``metrics/ppl.py``, on identical generator weights,
LPIPS weights and latent sequences.

``evaluate_ppl`` lives in ``/root/reference/metrics/evaluate_query.py``
(:135-249) whose module imports torch/tensorboard/the CUDA model at top
level and hard-codes ``device='cuda'``, ``n_sample=10000``,
``batch=64`` as local assignments — so, exactly like
``tests/test_fid_oracle.py`` does for ``calc_fid``, we lift the
function (plus its ``lerp``/``slerp``/``normalize`` helpers) with ast
and exec it.  The ONLY source rewrites are three literal assignments
(``device``, ``args_n_sample``, ``args_batch``) so the protocol runs on
CPU at test scale; every protocol decision — endpoint pairing, lerp at
(t, t+eps), interleaved restack, eval_plus mapping bypass, center crop,
LPIPS / eps², residual-batch handling, percentile filter — executes
from the reference's own lines.

The function's collaborators are injected through the exec namespace:
  * ``prepare_noise_new`` / ``prepare_param`` — the reference's REAL
    ``utils/sample.py`` functions, wrapped to record every drawn latent
    so our side replays the identical sequence;
  * ``lpips.PerceptualLoss`` — the reference's real net-lin VGG LPIPS
    with shared random-backbone + bundled v0.1 head weights (the
    ``test_lpips_oracle`` pattern);
  * ``generator`` — the reference torch Generator whose state_dict is
    ported to our params (the oracle-parity pattern).
"""

import ast
import importlib.util
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402
from test_lpips_oracle import _reference_import_env  # noqa: E402
from transeditor_tpu.config import ModelConfig  # noqa: E402
from transeditor_tpu.io import generator_params_from_torch  # noqa: E402
from transeditor_tpu.metrics.ppl import (  # noqa: E402
    make_ppl_distance_fn, percentile_filter_mean)
from transeditor_tpu.zoo.lpips import load_lpips_params  # noqa: E402

REF_EVALUATE_QUERY = "/root/reference/metrics/evaluate_query.py"
REF_SAMPLE = "/root/reference/utils/sample.py"

SIZE = 32
CFG = ModelConfig(size=SIZE, n_trans=2, pixel_norm_axis="feature")
EPS = 1e-4           # the reference's hard-coded args_eps
N_SAMPLE = 26        # 6 full batches of 4 + a residual batch of 2
BATCH = 4


class _LiteralRewrite(ast.NodeTransformer):
    """Rewrite ``<name> = <literal>`` for the three injected knobs."""

    REWRITES = {"device": "cpu", "args_n_sample": N_SAMPLE,
                "args_batch": BATCH}

    def visit_Assign(self, node):
        if (len(node.targets) == 1 and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id in self.REWRITES
                and isinstance(node.value, ast.Constant)):
            node.value = ast.Constant(self.REWRITES[node.targets[0].id])
        return node


def _lift_reference_evaluate_ppl(namespace):
    src = open(REF_EVALUATE_QUERY).read()
    tree = ast.parse(src)
    wanted = {"normalize", "slerp", "lerp", "evaluate_ppl"}
    fns = [n for n in tree.body
           if isinstance(n, ast.FunctionDef) and n.name in wanted]
    assert {f.name for f in fns} == wanted
    mod = ast.Module(body=[_LiteralRewrite().visit(f) for f in fns],
                     type_ignores=[])
    ast.fix_missing_locations(mod)
    exec(compile(mod, REF_EVALUATE_QUERY, "exec"), namespace)
    return namespace["evaluate_ppl"]


def _load_reference_sample_module():
    spec = importlib.util.spec_from_file_location("ref_sample", REF_SAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_gen():
    ref_mod = load_reference_module()
    torch.manual_seed(0)
    g = ref_mod.Generator(
        SIZE, CFG.style_dim, CFG.param_dim, CFG.token_dim,
        channel_multiplier=CFG.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    g.eval()
    return g


@pytest.fixture(scope="module")
def gen_params(ref_gen):
    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    return generator_params_from_torch(sd, CFG)


@pytest.fixture(scope="module")
def lpips_pair(ref_gen):
    """(reference PerceptualLoss, our params) sharing every weight."""
    torch.manual_seed(1)
    with _reference_import_env():
        import utils.lpips as ref_pkg
        percept = ref_pkg.PerceptualLoss(model="net-lin", net="vgg",
                                         use_gpu=False)
        percept.eval()
        percept.model.net.eval()
        sd = {k: v.numpy()
              for k, v in percept.model.net.state_dict().items()}
    backbone_sd = {
        "features." + k.split(".", 2)[2]: v
        for k, v in sd.items() if k.startswith("net.slice")}
    params = load_lpips_params(sd, net="vgg", backbone_sd=backbone_sd)
    return percept, params


def _run_lifted_reference(ref_gen, percept, space, eval_plus, crop,
                          use_slerp, seed):
    """Execute the reference's evaluate_ppl, recording drawn latents."""
    sample_mod = _load_reference_sample_module()
    recorded = []

    def rec_noise(n, args, device, method="multi", **kw):
        out = sample_mod.prepare_noise_new(n, args, device, method=method,
                                           **kw)
        recorded.append(("z", out.detach().clone()))
        return out

    def rec_param(n, args, device, method="batch_same", **kw):
        out = sample_mod.prepare_param(n, args, device, method=method, **kw)
        recorded.append(("p", out.detach().clone()))
        return out

    ns = {
        "torch": torch,
        "np": np,
        "F": torch.nn.functional,
        "tqdm": lambda x: x,
        "lpips": types.SimpleNamespace(PerceptualLoss=lambda **kw: percept),
        "prepare_noise_new": rec_noise,
        "prepare_param": rec_param,
    }
    evaluate_ppl = _lift_reference_evaluate_ppl(ns)
    args = types.SimpleNamespace(latent=CFG.style_dim,
                                 para_num=CFG.n_tokens)
    torch.manual_seed(seed)
    ppl = evaluate_ppl(args, ref_gen, space=space, eval_plus=eval_plus,
                       crop=crop, use_slerp=use_slerp)
    # pair up the per-batch (z, p) draws, in call order
    assert len(recorded) % 2 == 0
    batches = []
    for i in range(0, len(recorded), 2):
        (kz, z), (kp, p) = recorded[i], recorded[i + 1]
        assert (kz, kp) == ("z", "p")
        batches.append((z, p))
    return float(ppl), batches


@pytest.mark.parametrize(
    "space,eval_plus,crop,use_slerp",
    [("all", True, False, False),    # the headline setting (:361-364)
     ("z", False, True, True),       # crop + slerp, P batch-fixed
     ("p", True, False, False)])
def test_ppl_protocol_matches_lifted_reference(ref_gen, gen_params,
                                               lpips_pair, space,
                                               eval_plus, crop, use_slerp):
    percept, lpips_params = lpips_pair
    want_ppl, batches = _run_lifted_reference(
        ref_gen, percept, space, eval_plus, crop, use_slerp,
        seed=hash((space, eval_plus)) % (2 ** 31))
    # the lifted run covers full batches AND the residual batch
    assert sorted({z.shape[0] for z, _ in batches}) == [
        2 * (N_SAMPLE - (N_SAMPLE // BATCH) * BATCH), 2 * BATCH]

    ours = jax.jit(make_ppl_distance_fn(
        CFG, space=space, eval_plus=eval_plus, crop=crop, eps=EPS,
        use_slerp=use_slerp))

    got_d = []
    for z_t, p_t in batches:
        # reference layout [2B, D, T] -> ours [2B, T, D]
        z_j = jnp.asarray(z_t.numpy().transpose(0, 2, 1))
        p_j = jnp.asarray(p_t.numpy().transpose(0, 2, 1))
        got_d.append(np.asarray(
            ours(gen_params, lpips_params, z_j, p_j, jnp.float32(0.0))))
    got_d = np.concatenate(got_d)
    assert got_d.shape == (N_SAMPLE,)

    # distances are finite differences at eps=1e-4 in float32, so the
    # ~2e-4 model-parity noise amplifies a few % per element; a protocol
    # drift (pairing, crop, eps scaling, slerp axis, residual batch)
    # shifts them by orders of magnitude
    got_ppl = percentile_filter_mean(got_d)
    np.testing.assert_allclose(got_ppl, want_ppl, rtol=2e-2)


def _ref_percentile_mean(distances):
    """evaluate_query.py:244-249 verbatim (numpy still accepts the
    deprecated `interpolation=` kwarg; spelled `method=` here)."""
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    filtered_dist = np.extract(
        np.logical_and(lo <= distances, distances <= hi), distances)
    return filtered_dist.mean()


def test_percentile_filter_matches_reference_lines():
    """Pin the filter itself (lower/higher interpolation + inclusive
    bounds) on a spread of sizes, including ones where 'lower'/'higher'
    differ from the default linear interpolation — at the lifted run's
    n=26 the filter is a no-op (lo=min, hi=max), so this covers the
    protocol-scale regime the lifted oracle can't afford."""
    rng = np.random.RandomState(0)
    for n in (24, 100, 1000, 10_000):
        d = rng.lognormal(size=n).astype(np.float64)
        np.testing.assert_allclose(percentile_filter_mean(d),
                                   _ref_percentile_mean(d), rtol=0)
