"""Drive the InterfaceGAN editing pipeline on the TRAINED checkpoint.

VERDICT r4 #8: every committed editing drive (incl. the r3 150k-sample
protocol run) used fabricated generator weights; this closes the last
"only ever driven with fabricated weights" asterisk by running the
no-inversion pipeline — sample -> classifier scores -> dual Z+/P+ SVM
boundaries -> 3-space edit strips -> evaluation report — on the 256px
convergence run's trained ``g_ema``
(``/root/reference/our_interfaceGAN/edit_all_noinversion_ffhq.py:179-286``).

The pose classifier weights remain fabricated (the published
checkpoints are in ``.MISSING_LARGE_BLOBS``), so the boundary SCORES
are a fixed random function of the images, not real pose — fine for
exercising the machinery on a generator with real structure; the
report says so explicitly.

Run (on the v5e, after the convergence run + eval_trained_vs_init):
  python scripts/edit_on_trained.py [--work /tmp/convergence_256]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/convergence_256")
    ap.add_argument("--num_sample", type=int, default=4000)
    ap.add_argument("--steps", type=int, default=13)
    ap.add_argument("--n_edit_samples", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "docs", "convergence", "edit_on_trained_r5.json"))
    args = ap.parse_args()

    pts = sorted(glob.glob(os.path.join(args.work, "trained_*.pt")))
    assert pts, f"run scripts/eval_trained_vs_init.py first ({args.work})"
    ckpt = pts[-1]
    out_dir = os.path.join(args.work, "edit_trained")

    from transeditor_tpu.cli import edit as edit_cli
    from transeditor_tpu.cli import edit_eval as eval_cli

    t0 = time.time()
    edit_cli.main(["--ckpt", ckpt, "--attribute", "pose",
                   "--num_sample", str(args.num_sample),
                   "--steps", str(args.steps),
                   "--n_edit_samples", str(args.n_edit_samples),
                   "--config", "preset",
                   "--out_dir", out_dir, "--size", "256"])
    edit_s = round(time.time() - t0, 1)

    strips = sorted(glob.glob(os.path.join(out_dir, "**", "*.png"),
                              recursive=True))
    boundaries = sorted(glob.glob(os.path.join(out_dir, "**", "*.npy"),
                                  recursive=True))
    t0 = time.time()
    eval_out = os.path.join(out_dir, "edit_eval.json")
    strip_dirs = sorted({os.path.dirname(s) for s in strips})
    eval_cli.main(["--strips_dir", strip_dirs[0],
                   "--edited_attr", "pose",
                   "--boundaries"] + boundaries[:4] +
                  ["--out", eval_out])
    with open(eval_out) as f:
        ev = json.load(f)

    report = {
        "ckpt": os.path.basename(ckpt),
        "pipeline": "no-inversion pose preset (dual Z+/P+ SVM "
                    "boundaries, 3-space strips)",
        "num_sample": args.num_sample, "steps": args.steps,
        "edit_wall_s": edit_s,
        "eval_wall_s": round(time.time() - t0, 1),
        "n_strip_pngs": len(strips),
        "n_boundary_files": len(boundaries),
        "edit_eval": ev,
        "caveat": ("generator weights: NATIVELY TRAINED (256px "
                   "convergence run); classifier weights: fabricated "
                   "seeded random-init (published ckpts in "
                   ".MISSING_LARGE_BLOBS) — boundary scores are a "
                   "fixed random function, not real pose"),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("n_strip_pngs", "n_boundary_files", "edit_wall_s",
                       "eval_wall_s")}, indent=1), flush=True)


if __name__ == "__main__":
    main()
