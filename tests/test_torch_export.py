"""Reverse checkpoint port: our param trees -> reference-format torch
``.pt`` (io/torch_export.py).

Validates the torch-free zip/pickle writer against ``torch.load``, and
the inverse name mapping by strict-loading the exported state dict into
the reference Generator/Discriminator and comparing forwards with the
JAX model that produced the weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402
from transeditor_tpu.config import ModelConfig  # noqa: E402
from transeditor_tpu.io.torch_export import (  # noqa: E402
    discriminator_state_dict, export_reference_checkpoint,
    save_torch_checkpoint)
from transeditor_tpu.io.torch_port import (  # noqa: E402
    load_torch_checkpoint)
from transeditor_tpu.models import Discriminator, Generator  # noqa: E402

SIZE = 32
CFG = ModelConfig(size=SIZE, n_trans=2, pixel_norm_axis="feature")


def test_save_torch_checkpoint_roundtrip(tmp_path):
    obj = {
        "a": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
        "nested": {"b": np.ones((5,), np.int64),
                   "c": np.zeros((1, 1), np.float64),
                   "flag": True, "n": 7, "x": 1.5, "s": "hi",
                   "none": None},
        "u8": np.arange(4, dtype=np.uint8),
    }
    path = tmp_path / "t.pt"
    save_torch_checkpoint(str(path), obj)

    # torch's own loader
    got = torch.load(str(path), map_location="cpu", weights_only=False)
    np.testing.assert_array_equal(got["a"].numpy(), obj["a"])
    np.testing.assert_array_equal(got["nested"]["b"].numpy(),
                                  obj["nested"]["b"])
    assert got["nested"]["c"].dtype == torch.float64
    assert got["nested"]["flag"] is True
    assert got["nested"]["n"] == 7
    assert got["nested"]["x"] == 1.5
    assert got["nested"]["s"] == "hi"
    assert got["nested"]["none"] is None
    np.testing.assert_array_equal(got["u8"].numpy(), obj["u8"])

    # our torch-free reader too
    ours = load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(np.asarray(ours["a"]), obj["a"])


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module()


def _codes(seed, b=2):
    rng = np.random.RandomState(seed)
    z = rng.randn(b, 16, CFG.style_dim).astype(np.float32)
    p = rng.randn(b, 16, CFG.param_dim).astype(np.float32)
    return z, p


@pytest.mark.slow
def test_generator_export_parity(ref_mod, tmp_path):
    g = Generator(CFG)
    z0 = jnp.zeros((1, 16, 512))
    params = g.init(jax.random.PRNGKey(5), z0, z0)

    path = tmp_path / "exported.pt"
    export_reference_checkpoint(str(path), CFG, g_ema=params)

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    ref = ref_mod.Generator(
        SIZE, CFG.style_dim, CFG.param_dim, CFG.token_dim,
        channel_multiplier=CFG.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    ref.load_state_dict(ckpt["g_ema"], strict=True)   # every key present
    ref.eval()

    z, p = _codes(3)
    ours = np.asarray(g.apply(params, jnp.asarray(z),
                              jnp.asarray(p)).image)
    with torch.no_grad():
        theirs, _, _ = ref(torch.tensor(z.transpose(0, 2, 1)),
                           torch.tensor(p.transpose(0, 2, 1)),
                           return_latents=True)
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_discriminator_export_parity(ref_mod, tmp_path):
    d = Discriminator(CFG)
    params = d.init(jax.random.PRNGKey(9), jnp.zeros((1, SIZE, SIZE, 3)))

    path = tmp_path / "d.pt"
    save_torch_checkpoint(str(path),
                          {"d": discriminator_state_dict(params, CFG)})

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    ref = ref_mod.Discriminator(SIZE)
    ref.load_state_dict(ckpt["d"], strict=True)
    ref.eval()

    rng = np.random.RandomState(11)
    img = rng.randn(4, 3, SIZE, SIZE).astype(np.float32) * 0.5
    ours = np.asarray(d.apply(params,
                              jnp.asarray(img.transpose(0, 2, 3, 1))))
    with torch.no_grad():
        theirs = ref(torch.tensor(img)).numpy()
    np.testing.assert_allclose(ours.reshape(-1), theirs.reshape(-1),
                               atol=2e-3, rtol=1e-3)
