"""FFHQ face alignment (utils/face_align.py + cli/align.py).

The reference's align_all_parallel.py needs dlib; here the landmark
provider is pluggable, so the geometry is testable with synthetic
landmarks.
"""

import os

import numpy as np
import pytest

from transeditor_tpu.utils.face_align import align_face, ffhq_crop_quad

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def synth_landmarks(eye_l=(40, 50), eye_r=(88, 50), mouth_l=(48, 90),
                    mouth_r=(80, 90)):
    lm = np.zeros((68, 2))
    lm[36:42] = np.asarray(eye_l)
    lm[42:48] = np.asarray(eye_r)
    lm[48] = np.asarray(mouth_l)
    lm[54] = np.asarray(mouth_r)
    return lm


def synth_image(h=128, w=128):
    rng = np.random.RandomState(0)
    # smooth low-frequency pattern so warps stay comparable
    small = rng.rand(8, 8, 3)
    img = np.asarray(Image.fromarray(
        (small * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
    return img


def test_quad_geometry():
    quad, qsize = ffhq_crop_quad(synth_landmarks())
    # axis-aligned synthetic face: eye line horizontal => square quad
    assert quad.shape == (4, 2)
    np.testing.assert_allclose(quad[0], [-32, -42])
    np.testing.assert_allclose(quad[2], [160, 150])
    assert qsize == pytest.approx(192.0)


def test_align_face_center_and_shape():
    img = synth_image()
    lm = synth_landmarks()
    out = align_face(img, lm, output_size=64, transform_size=64)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # crop centre c = eye_avg + 0.1*eye_to_mouth = (64, 54)
    got = out[32, 32].astype(int)
    want = img[54, 64].astype(int)
    assert np.abs(got - want).max() < 40   # bilinear + pad blending slack


def test_align_scale_invariance():
    img = synth_image()
    lm = synth_landmarks()
    out1 = align_face(img, lm, output_size=64, transform_size=64)
    big = np.asarray(Image.fromarray(img).resize((256, 256),
                                                 Image.BILINEAR))
    out2 = align_face(big, lm * 2.0, output_size=64, transform_size=64)
    diff = np.abs(out1.astype(float) - out2.astype(float)).mean()
    assert diff < 12.0, diff


def test_align_cli_with_precomputed_landmarks(tmp_path):
    from transeditor_tpu.cli.align import main
    raw = tmp_path / "raw"
    raw.mkdir()
    img = synth_image()
    Image.fromarray(img).save(raw / "a.png")
    Image.fromarray(img[::-1]).save(raw / "b.png")
    np.savez(tmp_path / "lm.npz", **{"a.png": synth_landmarks()})

    main(["--root_path", str(raw), "--out_path", str(tmp_path / "out"),
          "--landmarks", str(tmp_path / "lm.npz"), "--output_size", "32"])
    out = np.asarray(Image.open(tmp_path / "out" / "a.png"))
    assert out.shape == (32, 32, 3)
    # b.png had no landmarks -> skipped, not written
    assert not os.path.exists(tmp_path / "out" / "b.png")
