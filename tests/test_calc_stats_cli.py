"""End-to-end test of cli.calc_stats (the calc_inception.py analogue)."""

import pickle

import numpy as np
import pytest


@pytest.mark.slow
def test_calc_stats_cli_folder(tmp_path):
    from PIL import Image

    from transeditor_tpu.cli.calc_stats import main

    data = tmp_path / "imgs"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(rng.randint(0, 256, (64, 64, 3),
                                    dtype=np.uint8)).save(
            data / f"{i}.png")
    out = tmp_path / "stats.pkl"

    # random-init inception (no weights flag); batch 4 over 6 images
    # exercises the partial final batch
    main(["--data_dir", str(data), "--out", str(out),
          "--size", "64", "--batch", "4"])

    stats = pickle.load(open(out, "rb"))
    assert stats["n"] == 6
    assert stats["mean"].shape == (2048,)
    assert stats["cov"].shape == (2048, 2048)
    assert np.isfinite(stats["mean"]).all()
    # covariance must be symmetric PSD-ish
    np.testing.assert_allclose(stats["cov"], stats["cov"].T, atol=1e-5)
