"""Paired folder-vs-folder metrics (calc_losses_on_images /
calc_id_loss_parallel analogues)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.metrics.paired import (load_pair_batch, make_id_fn,
                                            make_l2_fn, make_lpips_fn,
                                            pair_folders, paired_scores,
                                            write_report)


def _write_img(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def folders(tmp_path):
    res_dir, gt_dir = tmp_path / "res", tmp_path / "gt"
    res_dir.mkdir(), gt_dir.mkdir()
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (5, 32, 32, 3))
    for i, im in enumerate(imgs):
        _write_img(res_dir / f"{i:03d}.png", im)
        # gt 2 is stored as .jpg only -> exercises the extension
        # fallback of gt_res_dataset.py:17
        ext = "jpg" if i == 2 else "png"
        _write_img(gt_dir / f"{i:03d}.{ext}",
                   np.clip(im + (10 if i else 0), 0, 255))
    return str(res_dir), str(gt_dir)


def test_pair_folders_name_and_extension_fallback(folders):
    res_dir, gt_dir = folders
    pairs = pair_folders(res_dir, gt_dir)
    assert len(pairs) == 5
    assert pairs[2][1].endswith("002.jpg")
    for r, g in pairs:
        assert os.path.basename(r).split(".")[0] == \
               os.path.basename(g).split(".")[0]


def test_pair_folders_missing_gt_raises(tmp_path):
    (tmp_path / "r").mkdir(), (tmp_path / "g").mkdir()
    _write_img(tmp_path / "r" / "a.png", np.zeros((8, 8, 3)))
    with pytest.raises(FileNotFoundError):
        pair_folders(str(tmp_path / "r"), str(tmp_path / "g"))


def test_l2_exact_and_padding(folders):
    res_dir, gt_dir = folders
    pairs = pair_folders(res_dir, gt_dir)
    # batch_size 4 over 5 pairs -> one padded batch; every file scored
    scores = paired_scores(make_l2_fn(), pairs, resolution=32,
                           batch_size=4)
    assert len(scores) == 5
    a, b = load_pair_batch(pairs, 32)
    expect = np.mean((a - b) ** 2, axis=(1, 2, 3))
    got = np.array([scores[os.path.basename(r)] for r, _ in pairs])
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # pair 0 was written identical (jpg-free roundtrip) -> zero loss
    assert scores["000.png"] < 1e-10
    assert all(v > 0 for k, v in scores.items() if k != "000.png")


def test_lpips_mode(folders):
    res_dir, gt_dir = folders
    pairs = pair_folders(res_dir, gt_dir)
    from transeditor_tpu.zoo.lpips import LPIPS
    x0 = jnp.zeros((1, 32, 32, 3))
    params = LPIPS(net="alex").init(jax.random.PRNGKey(0), x0, x0)
    scores = paired_scores(make_lpips_fn(params), pairs,
                           resolution=32, batch_size=8)
    assert len(scores) == 5
    assert scores["000.png"] < 1e-6          # identical pair
    assert max(scores.values()) > 0


def test_id_mode_with_stub_embedder(folders):
    res_dir, gt_dir = folders
    pairs = pair_folders(res_dir, gt_dir)

    def stub_apply(unused_vars, img112):      # mean-pool "embedding"
        assert img112.shape[1:3] == (112, 112)
        f = jnp.mean(img112, axis=(1, 2))
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    fn = make_id_fn(stub_apply, None)
    # identical images -> cosine 1 exactly
    a, _ = load_pair_batch(pairs[:1] * 2, 256)
    sims = np.asarray(fn(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(sims, 1.0, atol=1e-5)


def test_write_report_formats(tmp_path, folders):
    res_dir, gt_dir = folders
    pairs = pair_folders(res_dir, gt_dir)
    scores = paired_scores(make_l2_fn(), pairs, resolution=16,
                           batch_size=8)
    out = str(tmp_path / "inference_metrics")
    mean, std = write_report(scores, out, "l2")
    txt = open(os.path.join(out, "stat_l2.txt")).read()
    assert txt.startswith("Average loss is ")
    loaded = json.load(open(os.path.join(out, "scores_l2.json")))
    assert set(loaded) == set(scores)
    np.testing.assert_allclose(mean, np.mean(list(scores.values())))
    # id mode uses the other reference string
    write_report(scores, out, "id")
    assert open(os.path.join(out, "stat_id.txt")).read().startswith(
        "New Average score is ")


def test_cli_l2_end_to_end(folders, tmp_path, capsys):
    res_dir, gt_dir = folders
    from transeditor_tpu.cli.img_metrics import main
    out = str(tmp_path / "rep")
    main(["--mode", "l2", "--data_path", res_dir, "--gt_path", gt_dir,
          "--resolution", "16", "--batch_size", "4", "--out", out])
    assert os.path.exists(os.path.join(out, "scores_l2.json"))
    assert "Average l2 over 5 images" in capsys.readouterr().out
