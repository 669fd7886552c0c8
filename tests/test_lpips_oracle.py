"""Graph-level oracle parity for BOTH LPIPS stacks the reference uses.

The reference carries two LPIPS implementations:
  * StarGAN-v2 AlexNet LPIPS (metrics/lpips.py:49-82) — the LPIPS
    diversity metric;
  * richzhang net-lin PNetLin (utils/lpips/networks_basic.py:22-86) —
    projector loss, PPL, encoder folder metrics.

Their conv backbones come from torchvision pretrained models, which
can't be downloaded offline — so these tests build the torchvision
architectures by hand with RANDOM weights, run the reference torch
modules with them, port the SAME weights into our Flax LPIPS, and
require matching distances.  The linear heads are the reference's own
bundled REAL weights (metrics/lpips_weights.ckpt, utils/lpips/weights/
v0.1/{alex,vgg}.pth), so head porting is validated on real data.

Random-but-shared backbones pin the computation graph exactly: input
scaling constants, tap placement, unit normalization, 1x1 head
application, spatial averaging, and reduction semantics.
"""

import contextlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

from transeditor_tpu.zoo.lpips import LPIPS, load_lpips_params

REF = "/root/reference"


def _alexnet_features():
    """torchvision alexnet `.features` layout (indices 0..12)."""
    return torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 11, 4, 2), torch.nn.ReLU(inplace=True),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(64, 192, 5, 1, 2), torch.nn.ReLU(inplace=True),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(192, 384, 3, 1, 1), torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(384, 256, 3, 1, 1), torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(256, 256, 3, 1, 1), torch.nn.ReLU(inplace=True),
        torch.nn.MaxPool2d(3, 2))


def _vgg16_features():
    """torchvision vgg16 `.features` layout (indices 0..30)."""
    layers, in_ch = [], 3
    for v in (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"):
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, 1, 1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    return torch.nn.Sequential(*layers)


@contextlib.contextmanager
def _reference_import_env():
    """Stub torchvision/skimage, expose the reference's namespace
    `utils` package, patch .cuda() to no-ops; restore everything."""
    saved = {}

    def stash(name, mod):
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.alexnet = lambda pretrained=True: types.SimpleNamespace(
        features=_alexnet_features())
    tvm.vgg16 = lambda pretrained=True: types.SimpleNamespace(
        features=_vgg16_features())
    tv.models = tvm
    stash("torchvision", tv)
    stash("torchvision.models", tvm)

    sk = types.ModuleType("skimage")
    skm = types.ModuleType("skimage.metrics")
    skm.structural_similarity = lambda *a, **k: 0.0
    sk.metrics = skm
    stash("skimage", sk)
    stash("skimage.metrics", skm)

    # the generator oracle (oracle_utils) installs a fake `utils`
    # module; drop every utils* entry so the reference's real
    # namespace package imports fresh, and restore afterwards
    for name in [m for m in list(sys.modules)
                 if m == "utils" or m.startswith("utils.")]:
        saved[name] = sys.modules.pop(name)

    sys.path.insert(0, REF)
    cuda_t, cuda_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = cuda_t, cuda_m
        sys.path.remove(REF)
        for name in [m for m in list(sys.modules)
                     if m == "utils" or m.startswith("utils.")]:
            del sys.modules[name]
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def _rand_pair(seed, size=64):
    g = torch.Generator().manual_seed(seed)
    x = torch.rand((3, 3, size, size), generator=g) * 2 - 1
    y = torch.rand((3, 3, size, size), generator=g) * 2 - 1
    return x, y


def test_stargan_alex_lpips_graph_oracle():
    """metrics/lpips.py LPIPS vs ours: random shared AlexNet backbone,
    REAL bundled lin heads (lpips_weights.ckpt)."""
    torch.manual_seed(0)
    with _reference_import_env():
        spec = importlib.util.spec_from_file_location(
            "ref_stargan_lpips", os.path.join(REF, "metrics/lpips.py"))
        mod = importlib.util.module_from_spec(spec)
        cwd = os.getcwd()
        os.chdir(REF)  # it loads 'metrics/lpips_weights.ckpt' from cwd
        try:
            spec.loader.exec_module(mod)
            ref = mod.LPIPS().eval()
        finally:
            os.chdir(cwd)

    x, y = _rand_pair(1)
    with torch.no_grad():
        want = float(ref(x, y))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = load_lpips_params(sd, net="alex")
    ours = LPIPS(net="alex")
    got = np.asarray(ours.apply(params, _nhwc(x), _nhwc(y)))
    assert got.shape == (3,)
    # reference returns the batch mean (torch.mean over all dims)
    np.testing.assert_allclose(float(got.mean()), want,
                               rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_richzhang_netlin_graph_oracle(net):
    """utils/lpips PerceptualLoss (net-lin) vs ours: random shared
    backbone, REAL v0.1 heads, per-sample distances."""
    torch.manual_seed(0)
    with _reference_import_env():
        import utils.lpips as ref_pkg
        ref = ref_pkg.PerceptualLoss(model="net-lin", net=net,
                                     use_gpu=False)
        ref.eval()
        ref.model.net.eval()   # NetLinLayer carries Dropout(0.5)

        x, y = _rand_pair(2)
        with torch.no_grad():
            want = ref(x, y).reshape(-1).numpy()

        sd = {k: v.numpy()
              for k, v in ref.model.net.state_dict().items()}

    # rebuild the torchvision-layout backbone dict from the PNetLin
    # slices — add_module(str(x)) preserved the original indices
    backbone_sd = {
        "features." + k.split(".", 2)[2]: v
        for k, v in sd.items() if k.startswith("net.slice")}
    params = load_lpips_params(sd, net=net, backbone_sd=backbone_sd)
    ours = LPIPS(net=net)
    got = np.asarray(ours.apply(params, _nhwc(x), _nhwc(y)),
                     np.float64)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float64),
                               rtol=1e-3, atol=1e-6)


def _load_ref_stargan_lpips():
    """Load the reference metrics/lpips.py LPIPS with its REAL bundled
    lin heads (cwd-relative ckpt load), inside the stubbed import env."""
    spec = importlib.util.spec_from_file_location(
        "ref_stargan_lpips", os.path.join(REF, "metrics/lpips.py"))
    mod = importlib.util.module_from_spec(spec)
    cwd = os.getcwd()
    os.chdir(REF)  # it loads 'metrics/lpips_weights.ckpt' from cwd
    try:
        spec.loader.exec_module(mod)
        return mod.LPIPS().eval()
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("pair_chunk", [36, 12])
def test_pairwise_diversity_assembly_oracle(pair_chunk):
    """The LPIPS-diversity ASSEMBLY vs the reference: identical images
    through our batched-triu-chunk pairwise mean
    (``make_pairwise_lpips_mean``) and the reference's per-pair loop
    ``calculate_lpips_given_images`` (evaluate_query.py:82-91),
    transcribed verbatim below with the same StarGAN LPIPS weights.

    Pins the pair enumeration (i<j upper triangle), the mean-of-pairs
    reduction, and the chunked gather evaluation (chunk=12 exercises
    the multi-chunk concat path; 36 the single-chunk path).
    """
    import jax.numpy as jnp
    from transeditor_tpu.metrics.evaluator import make_pairwise_lpips_mean

    torch.manual_seed(0)
    with _reference_import_env():
        ref = _load_ref_stargan_lpips()

    n = 9  # C(9,2) = 36 pairs
    g = torch.Generator().manual_seed(7)
    group = torch.rand((n, 3, 64, 64), generator=g) * 2 - 1

    # evaluate_query.py:82-91 verbatim (lpips passed in, as at :97)
    with torch.no_grad():
        lpips_values = []
        num_rand_outputs = len(group)
        for i in range(num_rand_outputs - 1):
            for j in range(i + 1, num_rand_outputs):
                lpips_values.append(ref(group[i], group[j]))
        want = float(torch.mean(torch.stack(lpips_values, dim=0)))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = load_lpips_params(sd, net="alex")
    pairwise_mean = make_pairwise_lpips_mean(n, pair_chunk=pair_chunk)
    got = float(pairwise_mean(params, jnp.asarray(_nhwc(group))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-6)
