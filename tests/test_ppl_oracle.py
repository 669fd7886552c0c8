"""PPL protocol oracle: the reference's `evaluate_ppl` assembly
(metrics/evaluate_query.py:135-249) run on torch-CPU vs ours, with
IDENTICAL generator weights, LPIPS weights, latents and lerp t.

The reference function hard-codes device='cuda', n_sample=10000 and its
internal sampling, so the assembly below is a line-faithful torch-CPU
transcription parameterized only by (latents, t, batch count) — every
protocol decision is kept verbatim and cited:

  * endpoint pairing ``x[::2], x[1::2]``                (:174, :193, :205)
  * lerp at (t, t+eps) / slerp normalize-over-tokens    (:41-42, :31-39)
  * interleaved restack ``stack([e0,e1],1).view(shape)``(:190, :200, :213)
  * eval_plus: lerp the MAPPED codes, decode with both
    mappings bypassed                                   (:165-166, :219-221)
  * center crop rows 3c:7c cols 2c:6c, c = H//8         (:223-226)
  * LPIPS(img[::2], img[1::2]) / eps²                   (:236-238)
  * percentile filter [1st lower, 99th higher] + mean   (:244-249)

Generator weights: random reference init ported via torch_port (the
oracle-parity pattern).  LPIPS: random shared VGG backbone + the
reference's REAL bundled v0.1 heads (the lpips-oracle pattern).
"""

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
from transeditor_tpu.zoo.lpips import LPIPS, load_lpips_params  # noqa: E402

SIZE = 32
CFG = ModelConfig(size=SIZE, n_trans=2, pixel_norm_axis="feature")
EPS = 1e-4
BATCH = 4
N_BATCHES = 3


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


def _ref_slerp(a, b, t):
    """evaluate_query.py:27-39 verbatim."""
    def normalize(x):
        return x / torch.sqrt(x.pow(2).sum(-1, keepdim=True))
    a = normalize(a)
    b = normalize(b)
    d = (a * b).sum(-1, keepdim=True)
    p = t * torch.acos(d)
    c = normalize(b - d * a)
    return normalize(a * torch.cos(p) + c * torch.sin(p))


@torch.no_grad()
def _ref_ppl_batch(generator, percept, inputs_z, inputs_p, lerp_t, *,
                   space, eval_plus, crop, use_slerp, eps=EPS):
    """One batch of the reference assembly, transcribed from
    evaluate_query.py:151-242 (device + sampling injected)."""
    if eval_plus:
        inputs_z, inputs_p = generator(inputs_z, inputs_p,
                                       return_mapped_codes=True)

    def lerp(a, b, t):
        return a + (b - a) * t

    interp = _ref_slerp if use_slerp else lerp

    def interp_pairs(x):
        t0, t1 = x[::2], x[1::2]
        e0 = interp(t0, t1, lerp_t)
        e1 = interp(t0, t1, lerp_t + eps)
        return torch.stack([e0, e1], 1).view(*x.shape)

    lerped_z = interp_pairs(inputs_z) if space in ("all", "z") \
        else inputs_z
    lerped_p = interp_pairs(inputs_p) if space in ("all", "p") \
        else inputs_p

    if not eval_plus:
        image, _, _ = generator(lerped_z, lerped_p)
    else:
        image, _, _ = generator(lerped_z, lerped_p,
                                use_style_mapping=False,
                                use_spatial_mapping=False)

    if crop:
        c = image.shape[2] // 8
        image = image[:, :, c * 3: c * 7, c * 2: c * 6]

    factor = image.shape[2] // 256
    if factor > 1:
        image = torch.nn.functional.interpolate(
            image, size=(256, 256), mode="bilinear", align_corners=False)

    dist = percept(image[::2], image[1::2]).view(
        image.shape[0] // 2) / (eps ** 2)
    return dist.cpu().numpy()


def _draw_latents(seed, space):
    """[2B, D, T] torch latents per batch, honouring the reference's
    batch-fixed sampling for the held space (prepare_noise_new
    'query_same' / prepare_param 'spatial_same', utils/sample.py)."""
    g = torch.Generator().manual_seed(seed)
    if space == "p":    # fix z across the batch
        z = torch.randn(CFG.style_dim, CFG.n_tokens,
                        generator=g).repeat(2 * BATCH, 1, 1)
    else:
        z = torch.randn(2 * BATCH, CFG.style_dim, CFG.n_tokens,
                        generator=g)
    if space == "z":    # fix p
        p = torch.randn(CFG.param_dim, CFG.n_tokens,
                        generator=g).repeat(2 * BATCH, 1, 1)
    else:
        p = torch.randn(2 * BATCH, CFG.param_dim, CFG.n_tokens,
                        generator=g)
    return z, p


@pytest.mark.parametrize(
    "space,eval_plus,crop,use_slerp,sampling",
    [("all", True, False, False, "end"),   # the headline setting
     ("z", False, True, True, "full"),     # crop + slerp + random t
     ("p", True, False, False, "end")])
def test_ppl_batch_oracle(ref_gen, gen_params, lpips_pair,
                          space, eval_plus, crop, use_slerp, sampling):
    percept, lpips_params = lpips_pair
    ours = make_ppl_distance_fn(CFG, space=space, eval_plus=eval_plus,
                                crop=crop, eps=EPS, use_slerp=use_slerp)
    ours = jax.jit(ours)

    tg = torch.Generator().manual_seed(99)
    want_all, got_all = [], []
    for b in range(N_BATCHES):
        z_t, p_t = _draw_latents(1000 + b, space)
        t = (float(torch.rand(1, generator=tg)) if sampling == "full"
             else 0.0)
        want = _ref_ppl_batch(ref_gen, percept, z_t, p_t,
                              torch.tensor([t]), space=space,
                              eval_plus=eval_plus, crop=crop,
                              use_slerp=use_slerp)
        # our layout: [2B, T, D]
        z_j = jnp.asarray(z_t.numpy().transpose(0, 2, 1))
        p_j = jnp.asarray(p_t.numpy().transpose(0, 2, 1))
        got = np.asarray(ours(gen_params, lpips_params, z_j, p_j,
                              jnp.float32(t)))
        assert got.shape == want.shape == (BATCH,)
        # distances are finite differences at eps=1e-4 in float32, so
        # the ~2e-4 model-parity noise is amplified a few % on
        # individual elements; a protocol drift (pairing, crop, eps
        # scaling, slerp axis) shifts them by orders of magnitude
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=1e-8)
        want_all.append(want)
        got_all.append(got)

    # the full protocol scalar: percentile filter + mean
    want_mean = _ref_percentile_mean(np.concatenate(want_all))
    got_mean = percentile_filter_mean(np.concatenate(got_all))
    np.testing.assert_allclose(got_mean, want_mean, rtol=2e-2)


def _ref_percentile_mean(distances):
    """evaluate_query.py:244-249 verbatim (numpy's deprecated
    `interpolation=` kwarg spelled as `method=`)."""
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    filtered_dist = np.extract(
        np.logical_and(lo <= distances, distances <= hi), distances)
    return filtered_dist.mean()


def test_percentile_filter_matches_reference_lines():
    """Pin the filter itself (lower/higher interpolation + inclusive
    bounds) on a spread of sizes, including ones where 'lower'/'higher'
    differ from the default linear interpolation."""
    rng = np.random.RandomState(0)
    for n in (24, 100, 1000):
        d = rng.lognormal(size=n).astype(np.float64)
        np.testing.assert_allclose(percentile_filter_mean(d),
                                   _ref_percentile_mean(d), rtol=0)
