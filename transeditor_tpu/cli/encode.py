"""Dual-space encoder inference CLI (the dual_space_encoder_test.py
analogue): batch-encode a test folder into encoded_z.npy /
encoded_p.npy for the editing pipeline (reference :143-161).

Usage:
  python -m transeditor_tpu.cli.encode --decoder_ckpt 790000.pt \
      --encoder_ckpt psp_out/best_model --data_dir test_imgs/ \
      --out_dir projection/encoder_inversion/ffhq_encode
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.data.dataset import ImageFolderSource
from transeditor_tpu.io.checkpoint import load_reference_generator
from transeditor_tpu.models.psp import GradualStyleEncoder, PSPModel
from transeditor_tpu.utils.image import save_png, to_uint8


def load_encoder_vars(path: str):
    """Orbax CoachState dir or a torch pSp checkpoint (.pt)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from transeditor_tpu.io.torch_port import load_torch_checkpoint
        from transeditor_tpu.io.zoo_port import port_gradual_style_encoder
        ckpt = load_torch_checkpoint(path)
        sd = ckpt.get("state_dict", ckpt)
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")}
        variables = port_gradual_style_encoder(enc_sd)
        avg = None
        if "z_plus_latent_avg" in ckpt:
            avg = (np.asarray(ckpt["z_plus_latent_avg"]).T,
                   np.asarray(ckpt["p_plus_latent_avg"]).T)
        return variables, avg
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as c:
        state = c.restore(os.path.abspath(path))
    return ({"params": state["enc_params"],
             "batch_stats": state["enc_stats"]}, None)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--decoder_ckpt", required=True)
    p.add_argument("--encoder_ckpt", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--save_inversions", action="store_true")
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(p)
    args = p.parse_args(argv)

    cfg = model_config_from_args(args)
    dec_params = load_reference_generator(args.decoder_ckpt, cfg)
    enc_vars, latent_avg = load_encoder_vars(args.encoder_ckpt)

    psp = PSPModel.create(cfg)
    if latent_avg is None:
        latent_avg = psp.estimate_latent_avg(dec_params,
                                             jax.random.PRNGKey(0))

    encoder = GradualStyleEncoder(train=False)
    # weight trees ride through jit as ARGUMENTS, not closure constants
    dec_params = jax.tree.map(jnp.asarray, dec_params)
    enc_vars = jax.tree.map(jnp.asarray, enc_vars)
    latent_avg = jax.tree.map(jnp.asarray, tuple(latent_avg))

    @jax.jit
    def encode(ev, avg, img):
        z, p = encoder.apply(ev, img)
        return z + avg[0][None], p + avg[1][None]

    @jax.jit
    def decode(dp, z, p):
        return psp.decode(dp, z, p, from_plus_space=True)

    source = ImageFolderSource(args.data_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    zs, ps = [], []
    for start in range(0, len(source), args.batch):
        idx = list(range(start, min(start + args.batch, len(source))))
        imgs = np.stack([source.get(i, cfg.size) for i in idx])
        x = jnp.asarray(imgs.astype(np.float32) / 127.5 - 1.0)
        z, p_codes = encode(enc_vars, latent_avg, x)
        zs.append(np.asarray(z))
        ps.append(np.asarray(p_codes))
        if args.save_inversions:
            inv = np.asarray(decode(dec_params, z, p_codes),
                             np.float32)
            for k, i in enumerate(idx):
                save_png(os.path.join(args.out_dir, f"inversion_{i}.png"),
                         to_uint8(inv)[k])
        print(f"encoded {idx[-1] + 1}/{len(source)}", flush=True)

    np.save(os.path.join(args.out_dir, "encoded_z.npy"),
            np.concatenate(zs))
    np.save(os.path.join(args.out_dir, "encoded_p.npy"),
            np.concatenate(ps))


if __name__ == "__main__":
    main()
