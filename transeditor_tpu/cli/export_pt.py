"""Export a trained checkpoint to the reference torch ``.pt`` layout
(reverse of the import port) — lets reference-code users consume models
trained with this framework (``ckpt = torch.load(...);
Generator(...).load_state_dict(ckpt['g_ema'])``).

Sources:
  * an Orbax GAN train-state dir written by cli.train_gan
    (``--orbax_dir out/run/checkpoint [--step N]``), or
  * a native ``.pt`` re-export round trip (``--ckpt in.pt``), useful
    for format surgery.

Usage:
  python -m transeditor_tpu.cli.export_pt --orbax_dir out/run/checkpoint \
      --size 256 --out 790000_exported.pt
"""

from __future__ import annotations

import argparse

import jax

from transeditor_tpu.io.torch_export import export_reference_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--orbax_dir", type=str, default=None,
                   help="cli.train_gan checkpoint dir (latest step "
                        "unless --step)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--ckpt", type=str, default=None,
                   help="reference-format .pt to round-trip instead")
    p.add_argument("--out", required=True)
    p.add_argument("--ema_only", action="store_true",
                   help="export only g_ema (skip g/d)")
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(p)
    args = p.parse_args(argv)

    cfg = model_config_from_args(args)
    if (args.orbax_dir is None) == (args.ckpt is None):
        p.error("pass exactly one of --orbax_dir / --ckpt")

    if args.orbax_dir:
        from transeditor_tpu.io.checkpoint import restore_train_state
        from transeditor_tpu.train.gan import TrainConfig, init_state
        template = init_state(cfg, TrainConfig(), jax.random.PRNGKey(0))
        state, step = restore_train_state(args.orbax_dir, template,
                                          args.step)
        print(f"exporting step {step}")
        g_ema = {"params": state.g_ema}
        g = None if args.ema_only else {"params": state.params_g}
        d = None if args.ema_only else {"params": state.params_d}
    else:
        from transeditor_tpu.io.checkpoint import (
            load_reference_discriminator, load_reference_generator)
        g_ema = load_reference_generator(args.ckpt, cfg)
        g = d = None
        if not args.ema_only:
            g = load_reference_generator(args.ckpt, cfg, key="g")
            d = load_reference_discriminator(args.ckpt, cfg)

    export_reference_checkpoint(args.out, cfg, g_ema=g_ema, g=g, d=d)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
