"""Edit-quality evaluation CLI (the editing_evaluate / calculate_score
/ editing_evaluate_id analogue).

Re-scores saved edit strips (from cli/edit.py) with one or more
attribute classifiers, then reports per-space disentanglement ratios
(drift of interest attributes / drift of the edited attribute),
score correlations, boundary cosines, and optional ArcFace ID
preservation vs the strip's center frame.

Usage:
  python -m transeditor_tpu.cli.edit_eval --strips_dir edits/age/3_7_0 \
      --edited_attr age --classifier age=age_sd.pth gender=gender_sd.pth \
      [--arcface ir_se50.pth] [--boundaries edits/boundary_age_z.npy ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from collections import defaultdict

import numpy as np

from transeditor_tpu.edit.evaluate import (boundary_cosine,
                                           disentanglement_score,
                                           id_preservation,
                                           score_correlation)

SPACES = ("pz_plus", "p_plus", "z_plus")
_FRAME_RE = re.compile(r"origin_(\d+)_edit_(\d+)_")


def load_strips(strips_dir: str):
    """{space: {sample: [steps,H,W,3] float[-1,1]}} from saved frames."""
    from PIL import Image
    out = {}
    for space in SPACES:
        d = os.path.join(strips_dir, space)
        if not os.path.isdir(d):
            continue
        frames = defaultdict(dict)
        for f in glob.glob(os.path.join(d, "origin_*_edit_*.png")):
            m = _FRAME_RE.search(os.path.basename(f))
            if not m:
                continue
            i, j = int(m.group(1)), int(m.group(2))
            frames[i][j] = f
        samples = {}
        for i, steps in frames.items():
            imgs = [np.asarray(Image.open(steps[j]).convert("RGB"))
                    for j in sorted(steps)]
            samples[i] = np.stack(imgs).astype(np.float32) / 127.5 - 1.0
        if samples:
            out[space] = samples
    return out


def build_scorers(specs):
    from transeditor_tpu.edit.classifiers import load_scorer_from_checkpoint
    scorers = {}
    for spec in specs or []:
        name, path = spec.split("=", 1)
        scorers[name] = load_scorer_from_checkpoint(name, path)
    return scorers


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--strips_dir", required=True)
    ap.add_argument("--edited_attr", required=True)
    ap.add_argument("--classifier", nargs="*", default=None,
                    help="attr=ckpt.pth pairs")
    ap.add_argument("--arcface", type=str, default=None)
    ap.add_argument("--id_inception", nargs="?", const="", default=None,
                    help="also report ID drift in InceptionV3 pool3 "
                         "feature space (the feature space of the "
                         "reference's editing_evaluate_id.py; summary "
                         "= mean step-vs-center cosine similarity); "
                         "optional value = pt_inception weights path")
    ap.add_argument("--boundaries", nargs="*", default=None,
                    help="boundary .npy files to cross-compare")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    strips = load_strips(args.strips_dir)
    scorers = build_scorers(args.classifier)
    report = {}

    if scorers:
        trajs = {a: {s: [] for s in strips} for a in scorers}
        for space, samples in strips.items():
            for i, imgs in sorted(samples.items()):
                for attr, scorer in scorers.items():
                    trajs[attr][space].append(
                        np.asarray(scorer(imgs)).tolist())
        report["trajectories"] = trajs
        if args.edited_attr in scorers:
            dis = {}
            for space in strips:
                change = trajs[args.edited_attr][space]
                for attr in scorers:
                    if attr == args.edited_attr:
                        continue
                    dis[f"{attr}/{space}"] = disentanglement_score(
                        change, trajs[attr][space])
                    dis[f"corr_{attr}/{space}"] = score_correlation(
                        change, trajs[attr][space])
            report["disentanglement"] = dis

    def _id_report(embed):
        """Per-space mean cosine similarity of each edit step to the
        strip center; the center embeds ONCE per strip."""
        ids = {}
        for space, samples in strips.items():
            sims = []
            for i, imgs in samples.items():
                feats = np.asarray(embed(imgs))
                mid = feats[len(imgs) // 2]
                sims.append(float(np.mean(feats @ mid)))
            ids[space] = float(np.mean(sims))
        return ids

    if args.arcface:
        import jax
        import jax.numpy as jnp
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        from transeditor_tpu.io.zoo_port import port_arcface
        from transeditor_tpu.models.irse import ArcFaceBackbone
        from transeditor_tpu.train.coach import face_crop, resize_112
        arc = ArcFaceBackbone()
        arc_vars = port_arcface(load_torch_checkpoint(args.arcface))

        # ONE jitted program per strip shape (per-op dispatch on the
        # axon backend is a ~30ms RPC each)
        @jax.jit
        def arc_embed(av, img):
            return arc.apply(av, resize_112(face_crop(img)))

        report["id_preservation"] = _id_report(
            lambda img: arc_embed(arc_vars, jnp.asarray(img)))

    if args.id_inception is not None:
        # ID drift in the REFERENCE'S feature space
        # (editing_evaluate_id.py:148-196 uses InceptionV3 pool3, not
        # ArcFace).  Reported as mean cosine similarity of each step
        # to the strip center — a summary of the same features; the
        # reference's calculate_score_id.py additionally splits
        # center/consecutive drifts by direction and ratios them
        # against the attribute change.  (Its x255-on-top-of-[-1,1]
        # input scaling bug is not reproduced; inputs are [-1,1].)
        import jax
        import jax.numpy as jnp
        from transeditor_tpu.metrics.inception import (
            InceptionV3Features, port_fid_inception_weights)
        inc = InceptionV3Features(resize_input=True,
                                  normalize_input=False)
        if args.id_inception:
            from transeditor_tpu.io.torch_port import load_torch_checkpoint
            inc_vars = port_fid_inception_weights(
                load_torch_checkpoint(args.id_inception))
        else:
            print("WARNING: random InceptionV3 (pass a weights path "
                  "with --id_inception for reportable values)")
            inc_vars = jax.jit(inc.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

        @jax.jit
        def inc_embed(iv, img):
            f = inc.apply(iv, img)
            return f * jax.lax.rsqrt(
                jnp.sum(f * f, axis=-1, keepdims=True) + 1e-12)

        report["id_preservation_inception"] = _id_report(
            lambda img: inc_embed(inc_vars, jnp.asarray(img)))

    if args.boundaries and len(args.boundaries) >= 2:
        cos = {}
        for i in range(len(args.boundaries)):
            for j in range(i + 1, len(args.boundaries)):
                a, b = args.boundaries[i], args.boundaries[j]
                cos[f"{os.path.basename(a)}~{os.path.basename(b)}"] = \
                    boundary_cosine(np.load(a), np.load(b))
        report["boundary_cosine"] = cos

    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
