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
        # weight trees ride through jit as ARGUMENTS, not closure
        # constants (numpy closures embed as HLO constants: huge
        # remote-compile payloads, recompile per checkpoint)
        self.dec_params = jax.tree.map(jnp.asarray, dec_params)
        self.enc_vars = jax.tree.map(jnp.asarray, enc_vars)
        if latent_avg is None and start_from_latent_avg:
            latent_avg = self.psp.estimate_latent_avg(
                self.dec_params, jax.random.PRNGKey(0))
        if latent_avg is not None:
            latent_avg = jax.tree.map(jnp.asarray, tuple(latent_avg))
        self.latent_avg = latent_avg
        self._encoder = GradualStyleEncoder(train=False)
        has_avg = latent_avg is not None

        @jax.jit
        def _encode(ev, avg, img):
            z, p = self._encoder.apply(ev, img)
            if has_avg:
                z = z + avg[0][None]
                p = p + avg[1][None]
            return z, p

        @jax.jit
        def _decode_plus(dp, z, p):
            return self.psp.decode(dp, z, p, from_plus_space=True)

        @jax.jit
        def _decode_raw(dp, z, p):
            return self.psp.decode(dp, z, p, from_plus_space=False)

        self._encode_fn = lambda img: _encode(self.enc_vars,
                                              self.latent_avg, img)
        self._decode_plus = lambda z, p: _decode_plus(self.dec_params, z, p)
        self._decode_raw = lambda z, p: _decode_raw(self.dec_params, z, p)

    def encode(self, images: np.ndarray):
        """[-1,1] NHWC images -> (z, p) plus-space tokens [B,16,512]."""
        z, p = self._encode_fn(jnp.asarray(images))
        return np.asarray(z), np.asarray(p)

    def decode(self, z, p, plus_space: bool = True) -> np.ndarray:
        fn = self._decode_plus if plus_space else self._decode_raw
        return np.asarray(fn(jnp.asarray(z), jnp.asarray(p)))
