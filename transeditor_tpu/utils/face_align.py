"""FFHQ-style face alignment (the offline preprocessing step before
encoder inversion).

Reference: ``pSp/scripts/align_all_parallel.py`` (itself the published
NVlabs/ffhq-dataset recipe) — dlib 68-point landmarks -> oriented crop
quad -> shrink / crop / reflect-pad / QUAD-warp to the model
resolution.  The reference hard-requires dlib at import; here the
landmark provider is PLUGGABLE: any ``[68, 2]`` float array works
(dlib if installed, an external landmark service, or precomputed
files), so the alignment math itself is dependency-free (numpy + PIL).

The warp/resampling runs on the host: this is one-time dataset
preprocessing at trivial FLOPs — putting it on the TPU would cost more
in transfers than it saves.
"""

from __future__ import annotations

import numpy as np


def ffhq_crop_quad(landmarks: np.ndarray) -> tuple[np.ndarray, float]:
    """68-point landmarks -> (oriented crop quad [4,2], qsize).

    The FFHQ geometry (align_all_parallel.py:62-87): x-axis along the
    eye line, sized by max(eye distance * 2, eye-to-mouth * 1.8),
    centred at eye_avg + 0.1 * eye_to_mouth.
    """
    lm = np.asarray(landmarks, np.float64)
    if lm.shape != (68, 2):
        raise ValueError(f"expected [68,2] landmarks, got {lm.shape}")
    eye_left = lm[36:42].mean(axis=0)
    eye_right = lm[42:48].mean(axis=0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[48] + lm[54]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    return quad, float(np.hypot(*x) * 2)


def align_face(
    image: np.ndarray,
    landmarks: np.ndarray,
    output_size: int = 256,
    transform_size: int = 256,
    enable_padding: bool = True,
) -> np.ndarray:
    """Align a face image given its 68-point landmarks.

    Args:
      image: [H, W, 3] uint8 RGB.
      landmarks: [68, 2] (x, y) pixel coordinates.

    Returns:
      [output_size, output_size, 3] uint8 aligned crop.

    Mirrors the reference pipeline (align_all_parallel.py:89-140):
    shrink for large faces, bordered crop, reflect-pad with blurred
    edge blend when the quad leaves the image, PIL QUAD warp.
    """
    import PIL.Image
    import scipy.ndimage

    quad, qsize = ffhq_crop_quad(landmarks)
    img = PIL.Image.fromarray(np.asarray(image, np.uint8), "RGB")

    resample_lanczos = getattr(PIL.Image, "LANCZOS",
                               getattr(PIL.Image, "ANTIALIAS", 1))

    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (int(np.rint(img.size[0] / shrink)),
                 int(np.rint(img.size[1] / shrink)))
        img = img.resize(rsize, resample_lanczos)
        quad = quad / shrink
        qsize /= shrink

    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (int(np.floor(quad[:, 0].min())), int(np.floor(quad[:, 1].min())),
            int(np.ceil(quad[:, 0].max())), int(np.ceil(quad[:, 1].max())))
    crop = (max(crop[0] - border, 0), max(crop[1] - border, 0),
            min(crop[2] + border, img.size[0]),
            min(crop[3] + border, img.size[1]))
    if crop[2] - crop[0] < img.size[0] or crop[3] - crop[1] < img.size[1]:
        img = img.crop(crop)
        quad = quad - crop[0:2]

    pad = (int(np.floor(quad[:, 0].min())), int(np.floor(quad[:, 1].min())),
           int(np.ceil(quad[:, 0].max())), int(np.ceil(quad[:, 1].max())))
    pad = (max(-pad[0] + border, 0), max(-pad[1] + border, 0),
           max(pad[2] - img.size[0] + border, 0),
           max(pad[3] - img.size[1] + border, 0))
    if enable_padding and max(pad) > border - 4:
        pad_arr = np.maximum(pad, int(np.rint(qsize * 0.3)))
        arr = np.pad(np.float32(img),
                     ((pad_arr[1], pad_arr[3]), (pad_arr[0], pad_arr[2]),
                      (0, 0)), "reflect")
        h, w, _ = arr.shape
        yy, xx, _ = np.ogrid[:h, :w, :1]
        mask = np.maximum(
            1.0 - np.minimum(np.float32(xx) / pad_arr[0],
                             np.float32(w - 1 - xx) / pad_arr[2]),
            1.0 - np.minimum(np.float32(yy) / pad_arr[1],
                             np.float32(h - 1 - yy) / pad_arr[3]))
        sigma = qsize * 0.02
        arr += ((scipy.ndimage.gaussian_filter(arr, [sigma, sigma, 0])
                 - arr) * np.clip(mask * 3.0 + 1.0, 0.0, 1.0))
        arr += (np.median(arr, axis=(0, 1)) - arr) * np.clip(mask, 0.0, 1.0)
        img = PIL.Image.fromarray(
            np.uint8(np.clip(np.rint(arr), 0, 255)), "RGB")
        quad = quad + pad_arr[:2]

    img = img.transform((transform_size, transform_size), PIL.Image.QUAD,
                        (quad + 0.5).flatten(), PIL.Image.BILINEAR)
    if output_size < transform_size:
        img = img.resize((output_size, output_size), resample_lanczos)
    return np.asarray(img)


def dlib_landmark_provider(predictor_path: str):
    """Build a ``path -> [68,2]`` landmark fn from dlib (optional dep).

    The returned callable raises ``ValueError`` when no face is found,
    matching the reference's skip-on-failure behaviour
    (align_all_parallel.py:163-165).
    """
    try:
        import dlib
    except ImportError as e:
        raise ImportError(
            "dlib is not installed; pass precomputed landmarks to "
            "align_face instead, or install dlib for auto-detection"
        ) from e

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(predictor_path)

    def get(path: str) -> np.ndarray:
        img = dlib.load_rgb_image(path)
        dets = detector(img, 1)
        if not dets:
            raise ValueError(f"no face detected in {path}")
        shape = predictor(img, dets[0])
        return np.array([[p.x, p.y] for p in shape.parts()], np.float64)

    return get
