"""Full-dress flagship-config drive: fabricate → port → TPU workflows.

VERDICT r1 #3 (drive half) + #9: fabricate a reference trainer bundle
at the EXACT flagship config of the published ``790000.pt`` (256px,
channel_multiplier=2, n_trans=8, 16 per-token mapping layers;
``train_spatial_query.py:361-371,381-415``), then drive the real user
workflows from it on the TPU, unmodified:

  1. ``cli.visualize --sample``           (sampling grids)
  2. ``cli.evaluate --fid --prdc``        (small-N protocols, incl. the
                                           previously-undriven PRDC path
                                           with the VGG16-fc7 port)

Pixel-level parity of this port is pinned by
``tests/test_flagship_port.py``; this script proves the same bundle
drives the CLIs end to end on the chip.

Run on this box:  python scripts/flagship_drive.py [--skip-fab]
Artifacts land in /tmp/flagship_drive/.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/flagship_drive"
BUNDLE = os.path.join(WORK, "010000.pt")
REAL = os.path.join(WORK, "real_images")
STATS = os.path.join(WORK, "real_stats.npz")


def fabricate():
    """Build the bundle + a tiny 'real' image folder (torch CPU)."""
    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    import numpy as np
    import torch
    from oracle_utils import load_reference_module
    from transeditor_tpu.config import ModelConfig

    cfg = ModelConfig()
    assert cfg.size == 256 and cfg.channel_multiplier == 2 \
        and cfg.n_trans == 8
    ref = load_reference_module()

    def make_g(seed):
        torch.manual_seed(seed)
        g = ref.Generator(
            cfg.size, cfg.style_dim, cfg.param_dim, cfg.token_dim,
            channel_multiplier=cfg.channel_multiplier,
            layer_noise_injection=False, use_spatial_mapping=True,
            num_region=1, n_trans=cfg.n_trans, pixel_norm_op_dim=1,
            no_trans=False)
        g.eval()
        return g

    g, g_ema = make_g(0), make_g(1)
    torch.manual_seed(2)
    d = ref.Discriminator(cfg.size,
                          channel_multiplier=cfg.channel_multiplier)
    g_ratio, d_ratio = 4 / 5.0, 16 / 17.0
    g_optim = torch.optim.Adam(g.parameters(), lr=0.002 * g_ratio,
                               betas=(0 ** g_ratio, 0.99 ** g_ratio))
    d_optim = torch.optim.Adam(d.parameters(), lr=0.002 * d_ratio,
                               betas=(0 ** d_ratio, 0.99 ** d_ratio))
    for opt, net in ((g_optim, g), (d_optim, d)):
        for p in net.parameters():
            p.grad = torch.zeros_like(p)
        opt.step()
        opt.zero_grad(set_to_none=True)
    torch.save({"g": g.state_dict(), "d": d.state_dict(),
                "g_ema": g_ema.state_dict(),
                "g_optim": g_optim.state_dict(),
                "d_optim": d_optim.state_dict()}, BUNDLE)
    print(f"bundle: {BUNDLE} "
          f"({os.path.getsize(BUNDLE) / 1e6:.0f} MB)")

    # tiny 'real' set for FID stats + PRDC nearest-neighbour manifold
    os.makedirs(REAL, exist_ok=True)
    from PIL import Image
    rng = np.random.RandomState(0)
    for i in range(64):
        arr = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(REAL, f"{i:03d}.jpg"),
                                  quality=95)
    print(f"real folder: {REAL} (64 imgs)")


def run(tag, mod, *args):
    cmd = [sys.executable, "-m", mod, *args]
    t0 = time.time()
    p = subprocess.run(cmd, cwd=ROOT, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True,
                       timeout=3600)
    dt = time.time() - t0
    tail = "\n".join(p.stdout.strip().splitlines()[-12:])
    print(f"--- {tag}: rc={p.returncode} {dt:.0f}s\n{tail}", flush=True)
    if p.returncode != 0:
        sys.exit(f"{tag} FAILED")
    return p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-fab", action="store_true")
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)

    if not args.skip_fab and not os.path.exists(BUNDLE):
        fabricate()
    elif not os.path.exists(BUNDLE):
        sys.exit("no bundle; run without --skip-fab")

    run("calc_stats", "transeditor_tpu.cli.calc_stats",
        "--data_dir", REAL, "--out", STATS,
        "--n_samples", "64", "--batch", "16")

    run("visualize --sample", "transeditor_tpu.cli.visualize",
        "--ckpt", BUNDLE, "--out", os.path.join(WORK, "visual"),
        "--sample", "--n_sample", "4", "--loop_num", "2")

    out = run("evaluate --fid --prdc", "transeditor_tpu.cli.evaluate",
              "--ckpt", BUNDLE, "--fid", "--prdc",
              "--inception_stats", STATS,
              "--real_data", REAL,
              "--fid_samples", "64", "--prdc_samples", "64",
              "--batch", "16")
    for line in out.splitlines():
        if line.startswith("{"):
            print("RESULT", json.dumps(json.loads(line)))
    print("FLAGSHIP DRIVE OK")


if __name__ == "__main__":
    main()
