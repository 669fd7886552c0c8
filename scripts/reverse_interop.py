"""Reverse interop of a NATIVELY TRAINED checkpoint (VERDICT r3 #7).

The export drive already proves a ported-then-exported bundle loads in
the reference; this closes the loop on a natively trained state: load
the 256px convergence run's Orbax checkpoint (scripts/convergence_run.py
--size 256), export it with io.torch_export, load ``g_ema`` into the
reference Generator on torch-CPU (stubbed CUDA ops, the reference's own
consumer path — test_spatial_query.py:278-287), and assert pixel parity
of a fixed-(Z, P) forward against our side.

Writes docs/convergence/reverse_interop_r4.json with the measured
error, gated by tests/test_convergence.py.

Run:  python scripts/reverse_interop.py [--work /tmp/convergence_256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/convergence_256")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "docs", "convergence", "reverse_interop_r4.json"))
    args = ap.parse_args()

    import jax
    try:
        # run our forward on CPU: the parity claim is about the PORT,
        # so keep both sides on the same arithmetic (torch is CPU here;
        # TPU f32 conv numerics add ~5x to the mean delta — measured
        # 1.08e-3 on axon vs the CPU number in the committed report)
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.io.checkpoint import restore_train_state
    from transeditor_tpu.io.torch_export import export_reference_checkpoint
    from transeditor_tpu.models import Generator
    from transeditor_tpu.train.gan import init_state

    cfg = ModelConfig(size=args.size,
                      n_trans=(8 if args.size >= 256 else 2))
    template = init_state(cfg, TrainConfig(), jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(args.work, "gan", "checkpoint")
    state, step = restore_train_state(ckpt_dir, template)
    print(f"restored natively trained step {step} from {ckpt_dir}")

    pt_path = os.path.join(args.work, f"export_{step}.pt")
    export_reference_checkpoint(pt_path, cfg,
                                g_ema={"params": state.g_ema})
    print(f"exported -> {pt_path}")

    # our side: f32 apply of the trained g_ema on fixed codes
    gen = Generator(cfg)       # default dtype float32 (parity path)
    rng = np.random.RandomState(123)
    z = rng.randn(2, cfg.n_tokens, cfg.style_dim).astype(np.float32)
    p = rng.randn(2, cfg.n_tokens, cfg.param_dim).astype(np.float32)
    ours = np.asarray(gen.apply({"params": state.g_ema},
                                jnp.asarray(z), jnp.asarray(p)).image)

    # reference side: torch-CPU with stubbed CUDA ops — the consumer
    # path a reference user would actually run
    import torch

    from oracle_utils import load_reference_module
    ref_mod = load_reference_module()
    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    ref = ref_mod.Generator(
        cfg.size, cfg.style_dim, cfg.param_dim, cfg.token_dim,
        channel_multiplier=cfg.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=cfg.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    ref.load_state_dict(ckpt["g_ema"], strict=True)
    ref.eval()
    with torch.no_grad():
        theirs, _, _ = ref(torch.tensor(z.transpose(0, 2, 1)),
                           torch.tensor(p.transpose(0, 2, 1)),
                           return_latents=True)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    max_abs = float(np.max(np.abs(ours - theirs)))
    mean_abs = float(np.mean(np.abs(ours - theirs)))
    out_range = float(np.max(np.abs(theirs)))

    # the consumer-visible statement: quantize both sides the way every
    # reference script materializes images (utils [-1,1] -> uint8) and
    # bound the per-pixel delta.  Raw float tolerances are dominated by
    # conv-order noise accumulated through 13 trained layers.
    def to_u8(a):
        return np.clip((a + 1) * 127.5, 0, 255).round().astype(np.int16)
    px_delta_max = int(np.max(np.abs(to_u8(ours) - to_u8(theirs))))
    print(f"pixel parity: max_abs={max_abs:.2e} mean_abs={mean_abs:.2e} "
          f"uint8_delta_max={px_delta_max} (output range ~{out_range:.2f})")
    assert mean_abs < 1e-3, mean_abs
    assert px_delta_max <= 2, px_delta_max   # <=2/255 per pixel

    report = {"step": int(step), "size": cfg.size, "n_trans": cfg.n_trans,
              "max_abs_err": max_abs, "mean_abs_err": mean_abs,
              "uint8_delta_max": px_delta_max,
              "output_absmax": out_range,
              "strict_load": True, "export": os.path.basename(pt_path)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("REVERSE_INTEROP_OK", json.dumps(report))


if __name__ == "__main__":
    main()
