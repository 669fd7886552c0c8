"""DualSpaceEncoder: thin inference wrapper (the dual_space_encoder.py
analogue: encode(img) -> (z, p); decode(z, p, plus_space) -> img,
reference dual_space_encoder.py:12-32).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models.psp import GradualStyleEncoder, PSPModel


class DualSpaceEncoder:
    def __init__(self, cfg: ModelConfig, dec_params, enc_vars,
                 latent_avg: Optional[Tuple] = None,
                 start_from_latent_avg: bool = True):
        self.cfg = cfg
        self.psp = PSPModel.create(cfg)
        self.dec_params = dec_params
        self.enc_vars = enc_vars
        if latent_avg is None and start_from_latent_avg:
            latent_avg = self.psp.estimate_latent_avg(
                dec_params, jax.random.PRNGKey(0))
        self.latent_avg = latent_avg
        self._encoder = GradualStyleEncoder(train=False)

        @jax.jit
        def _encode(img):
            z, p = self._encoder.apply(enc_vars, img)
            if self.latent_avg is not None:
                z = z + self.latent_avg[0][None]
                p = p + self.latent_avg[1][None]
            return z, p

        @jax.jit
        def _decode_plus(z, p):
            return self.psp.decode(dec_params, z, p, from_plus_space=True)

        @jax.jit
        def _decode_raw(z, p):
            return self.psp.decode(dec_params, z, p, from_plus_space=False)

        self._encode_fn = _encode
        self._decode_plus = _decode_plus
        self._decode_raw = _decode_raw

    def encode(self, images: np.ndarray):
        """[-1,1] NHWC images -> (z, p) plus-space tokens [B,16,512]."""
        z, p = self._encode_fn(jnp.asarray(images))
        return np.asarray(z), np.asarray(p)

    def decode(self, z, p, plus_space: bool = True) -> np.ndarray:
        fn = self._decode_plus if plus_space else self._decode_raw
        return np.asarray(fn(jnp.asarray(z), jnp.asarray(p)))
