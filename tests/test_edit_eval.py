import numpy as np

from transeditor_tpu.cli.edit_eval import load_strips
from transeditor_tpu.edit.evaluate import (boundary_cosine,
                                           direction_deltas,
                                           disentanglement_score)
from transeditor_tpu.utils.image import save_png, to_uint8


def test_direction_deltas():
    traj = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # monotone increasing
    pos, neg = direction_deltas(traj)
    assert pos == 3.0 and neg == -3.0


def test_disentanglement_score_perfect():
    change = [[0, 1, 2, 3, 4, 5, 6]] * 4
    frozen = [[2, 2, 2, 2, 2, 2, 2]] * 4     # interest attr unmoved
    assert disentanglement_score(change, frozen) == 0.0


def test_boundary_cosine():
    a = np.asarray([[1.0, 0.0]])
    b = np.asarray([[0.0, 1.0]])
    assert abs(boundary_cosine(a, a) - 1.0) < 1e-6
    assert abs(boundary_cosine(a, b)) < 1e-6


def test_load_strips_roundtrip(tmp_path):
    d = tmp_path / "p_plus"
    d.mkdir()
    imgs = np.linspace(-1, 1, 3 * 8 * 8 * 3, dtype=np.float32)
    imgs = imgs.reshape(3, 8, 8, 3)
    for j in range(3):
        save_png(str(d / f"origin_0_edit_{j}_age_42.png"),
                 to_uint8(imgs)[j])
    strips = load_strips(str(tmp_path))
    assert "p_plus" in strips
    got = strips["p_plus"][0]
    assert got.shape == (3, 8, 8, 3)
    np.testing.assert_allclose(got, imgs, atol=0.02)


def test_build_scorers_dispatches_pose(tmp_path):
    """Regression: build_scorers must port 'pose' via the resnet18
    porter, not the DEX VGG porter (KeyError on conv.0.conv1.weight)."""
    import torch
    from test_pose_classifier import torch_classify_model
    from transeditor_tpu.cli.edit_eval import build_scorers

    sd_path = str(tmp_path / "pose.pt")
    torch.save(torch_classify_model().state_dict(), sd_path)
    scorers = build_scorers([f"pose={sd_path}"])
    img = np.zeros((2, 64, 64, 3), np.float32)
    scores = np.asarray(scorers["pose"](img))
    assert scores.shape == (2,) and np.all(np.isfinite(scores))


def test_id_inception_mode(tmp_path, capsys):
    """--id_inception reports pool3-feature ID drift per space (the
    reference editing_evaluate_id.py protocol); identical strip
    images must give similarity ~1."""
    from transeditor_tpu.cli.edit_eval import main

    d = tmp_path / "z_plus"
    d.mkdir()
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    for j in range(3):   # identical image at every edit step
        save_png(str(d / f"origin_0_edit_{j}_age_42.png"),
                 to_uint8(img[None])[0])
    out = tmp_path / "report.json"
    main(["--strips_dir", str(tmp_path), "--edited_attr", "age",
          "--id_inception", "--out", str(out)])
    import json
    report = json.loads(out.read_text())
    sim = report["id_preservation_inception"]["z_plus"]
    assert abs(sim - 1.0) < 1e-3
