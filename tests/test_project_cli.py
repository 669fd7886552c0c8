"""End-to-end test of cli.project (projector_optimization.py analogue),
including the padded tail batch (no per-tail retrace)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402

from transeditor_tpu.config import ModelConfig  # noqa: E402

SIZE = 32
CFG = ModelConfig(size=SIZE, n_trans=2)


@pytest.mark.slow
def test_project_cli_end_to_end(tmp_path):
    from PIL import Image

    ref_mod = load_reference_module()
    torch.manual_seed(0)
    g = ref_mod.Generator(
        SIZE, CFG.style_dim, CFG.param_dim, CFG.token_dim,
        channel_multiplier=CFG.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    ckpt = str(tmp_path / "g.pt")
    torch.save({"g_ema": g.state_dict()}, ckpt)

    data = tmp_path / "imgs"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (SIZE, SIZE, 3),
                                    dtype=np.uint8)).save(
            data / f"{i}.png")
    out = tmp_path / "proj"

    from transeditor_tpu.cli.project import main
    # batch 2 over 3 images -> the tail batch pads to 2 and slices back
    main(["--ckpt", ckpt, "--dataset_dir", str(data),
          "--size", str(SIZE), "--num_trans", str(CFG.n_trans),
          "--step", "4", "--batch", "2", "--output_dir", str(out)])

    z = np.load(out / "latents.npy")
    p = np.load(out / "param.npy")
    assert z.shape == (3, CFG.n_tokens, CFG.style_dim)
    assert p.shape == (3, CFG.n_tokens, CFG.param_dim)
    assert np.isfinite(z).all() and np.isfinite(p).all()
    for i in range(3):
        assert os.path.exists(out / f"origin_{i}.png")
        assert os.path.exists(out / f"project_{i}.png")
    # padding must not leak: no duplicated latent rows from the repeat
    assert not np.allclose(z[1], z[2])
