"""End-to-end test of cli.encode (the dual_space_encoder_test.py
analogue): torch pSp checkpoint -> encoded_z/p.npy (+ inversions)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402

from transeditor_tpu.config import ModelConfig  # noqa: E402

SIZE = 64
CFG = ModelConfig(size=SIZE, n_trans=2)


@pytest.fixture(scope="module", autouse=True)
def _stubs():
    load_reference_module()


@pytest.fixture(scope="module")
def psp_pt(tmp_path_factory):
    """Fabricate a reference-layout pSp checkpoint: encoder.* state
    dict + plus-space latent averages (coach_new.py:358-371)."""
    from types import SimpleNamespace

    from pSp.models.encoders.psp_encoders_new import GradualStyleEncoder
    torch.manual_seed(0)
    enc = GradualStyleEncoder(50, "ir_se", SimpleNamespace(input_nc=3))
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    rng = np.random.RandomState(1)
    ckpt = {
        "state_dict": sd,
        "z_plus_latent_avg": torch.tensor(
            rng.randn(CFG.style_dim, CFG.n_tokens).astype(np.float32)),
        "p_plus_latent_avg": torch.tensor(
            rng.randn(CFG.param_dim, CFG.n_tokens).astype(np.float32)),
    }
    path = str(tmp_path_factory.mktemp("psp") / "best_model.pt")
    torch.save(ckpt, path)
    return path


@pytest.fixture(scope="module")
def dec_pt(tmp_path_factory):
    ref_mod = load_reference_module()
    torch.manual_seed(0)
    g = ref_mod.Generator(
        SIZE, CFG.style_dim, CFG.param_dim, CFG.token_dim,
        channel_multiplier=CFG.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    path = str(tmp_path_factory.mktemp("dec") / "g.pt")
    torch.save({"g_ema": g.state_dict()}, path)
    return path


@pytest.mark.slow
def test_encode_cli_end_to_end(psp_pt, dec_pt, tmp_path):
    from PIL import Image

    from transeditor_tpu.cli.encode import main

    data_dir = tmp_path / "imgs"
    data_dir.mkdir()
    rng = np.random.RandomState(2)
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (SIZE, SIZE, 3),
                                    dtype=np.uint8)).save(
            data_dir / f"{i}.png")
    out_dir = tmp_path / "enc"

    # batch 2 over 3 images -> exercises the partial final batch
    main(["--decoder_ckpt", dec_pt, "--encoder_ckpt", psp_pt,
          "--data_dir", str(data_dir), "--out_dir", str(out_dir),
          "--size", str(SIZE), "--num_trans", str(CFG.n_trans),
          "--batch", "2", "--save_inversions"])

    z = np.load(out_dir / "encoded_z.npy")
    p = np.load(out_dir / "encoded_p.npy")
    assert z.shape == (3, CFG.n_tokens, CFG.style_dim)
    assert p.shape == (3, CFG.n_tokens, CFG.param_dim)
    assert np.isfinite(z).all() and np.isfinite(p).all()
    # encoder output is deterministic: same image -> same codes is NOT
    # expected here (different random images), but codes must differ
    assert not np.allclose(z[0], z[1])
    for i in range(3):
        assert os.path.exists(out_dir / f"inversion_{i}.png")
