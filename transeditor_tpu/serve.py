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
serves every request size.  Concurrent requests are COALESCED: a
micro-batching queue (2 ms window) merges simultaneous sample/decode
calls into one device program, so throughput under load approaches the
generator's batched img/s instead of 1 request = 1 dispatch.  The HTTP
front (stdlib ThreadingHTTPServer, JSON) is a thin adapter — the
engine is the library API.

Run directly:
  python -m transeditor_tpu.serve --ckpt 790000.pt --port 8000
  python -m transeditor_tpu.serve --orbax_dir out/run/checkpoint ...
"""

from __future__ import annotations

import functools
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.edit.boundary import linear_interpolate
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.image import to_uint8
from transeditor_tpu.utils.sampling import sample_zp


# Largest single device program: keeps the compiled-program ladder
# bounded AND stays under HBM at 256px (batch 512 OOMs a v5e there —
# see README perf journal); bigger merged requests run in chunks.
_MAX_DEVICE_BATCH = 256


def _pad_pow2(n: int, lo: int = 1, hi: int = _MAX_DEVICE_BATCH) -> int:
    p = lo
    while p < n and p < hi:
        p *= 2
    return p


class _Batcher:
    """Coalesce concurrent requests into one device call.

    ``run(items) -> [result_per_item]`` executes a merged batch; the
    worker drains the queue for ``window_ms`` after the first request
    (or until ``max_items``) before running."""

    def __init__(self, run, max_items: int = 64, window_ms: float = 2.0):
        self._run = run
        self._q: queue.Queue = queue.Queue()
        self._max = max_items
        self._window = window_ms / 1e3
        self.calls = 0                    # device dispatches (for tests)
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def submit(self, item) -> Future:
        f: Future = Future()
        self._q.put((item, f))
        return f

    def _loop(self):
        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._window
            while len(batch) < self._max:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                self.calls += 1
                results = self._run([b[0] for b in batch])
                for (_, fut), r in zip(batch, results):
                    fut.set_result(r)
            except Exception as e:
                for _, fut in batch:
                    fut.set_exception(e)


class InferenceEngine:
    def __init__(self, cfg: ModelConfig, gen_params, seed: int = 0,
                 coalesce_window_ms: float = 5.0):
        self.cfg = cfg
        self.gen = Generator(cfg)
        # device arrays: jit sees the weights as arguments, never as
        # closure constants
        self.params = jax.tree.map(jnp.asarray, gen_params)
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._sample_batcher = _Batcher(self._run_samples,
                                        window_ms=coalesce_window_ms)
        self._decode_batchers = {
            True: _Batcher(lambda items: self._run_decodes(items, True),
                           window_ms=coalesce_window_ms),
            False: _Batcher(lambda items: self._run_decodes(items, False),
                            window_ms=coalesce_window_ms),
        }

    def _next_key(self):
        with self._lock:
            self._key, k = jax.random.split(self._key)
        return k

    @functools.lru_cache(maxsize=32)
    def _sample_fn(self, batch: int):
        @jax.jit
        def f(params, key):
            z, p = sample_zp(key, batch, self.cfg.n_tokens,
                             self.cfg.style_dim)
            out = self.gen.apply(params, z, p)
            return out.image, out.z_plus, out.p_plus
        return f

    @functools.lru_cache(maxsize=32)
    def _decode_fn(self, batch: int, plus_space: bool):
        @jax.jit
        def f(params, z, p):
            out = self.gen.apply(params, z, p, map_z=not plus_space,
                                 map_p=not plus_space)
            return out.image
        return f

    # ----------------------------------------------------- batched runs

    def _run_samples(self, counts: List[int]):
        total = sum(counts)
        # chunk merged requests > _MAX_DEVICE_BATCH across device calls
        # (a pow2 cap alone would silently truncate large requests)
        imgs, zps, pps, done = [], [], [], 0
        while done < total:
            take = min(total - done, _MAX_DEVICE_BATCH)
            img, zp, pp = self._sample_fn(_pad_pow2(take))(
                self.params, self._next_key())
            imgs.append(to_uint8(np.asarray(img, np.float32)[:take]))
            zps.append(np.asarray(zp)[:take])
            pps.append(np.asarray(pp)[:take])
            done += take
        img = np.concatenate(imgs)
        zp, pp = np.concatenate(zps), np.concatenate(pps)
        out, start = [], 0
        for n in counts:
            out.append((img[start:start + n], zp[start:start + n],
                        pp[start:start + n]))
            start += n
        return out

    def _run_decodes(self, items: List[Tuple[np.ndarray, np.ndarray]],
                     plus_space: bool):
        counts = [z.shape[0] for z, _ in items]
        n = sum(counts)
        t, d = items[0][0].shape[-2:]
        z_all = np.concatenate([z for z, _ in items]).astype(np.float32)
        p_all = np.concatenate([p for _, p in items]).astype(np.float32)
        imgs, done = [], 0
        while done < n:
            take = min(n - done, _MAX_DEVICE_BATCH)
            b = _pad_pow2(take)
            zp = np.zeros((b, t, d), np.float32)
            pp = np.zeros((b, t, d), np.float32)
            zp[:take] = z_all[done:done + take]
            pp[:take] = p_all[done:done + take]
            img = self._decode_fn(b, plus_space)(
                self.params, jnp.asarray(zp), jnp.asarray(pp))
            imgs.append(to_uint8(np.asarray(img, np.float32)[:take]))
            done += take
        img = np.concatenate(imgs)
        out, start = [], 0
        for c in counts:
            out.append(img[start:start + c])
            start += c
        return out

    # ------------------------------------------------------------- API

    def warmup(self, max_batch: int = 64, decode: bool = True):
        """Pre-compile the power-of-two program ladder.

        Without this, the first request at each padded batch size pays
        its compile (seconds) INSIDE the coalescing queue, stalling
        every concurrent caller behind it — measured 12.5 s p50 for a
        32-request burst on a cold axon server vs sub-second warm.
        One-time cost at startup instead."""
        b = 1
        t, d = self.cfg.n_tokens, self.cfg.style_dim
        while b <= max_batch:
            img, zp, pp = self._sample_fn(b)(self.params, self._next_key())
            float(np.asarray(jnp.sum(img)))  # force execution (axon)
            if decode:
                z = np.zeros((b, t, d), np.float32)
                for plus in (True, False):
                    out = self._decode_fn(b, plus)(
                        self.params, jnp.asarray(z), jnp.asarray(z))
                    float(np.asarray(jnp.sum(out)))
            b *= 2

    def sample(self, n: int):
        """Returns (uint8 images [n,H,W,3], z_plus, p_plus).
        Concurrent callers are coalesced into one device call."""
        return self._sample_batcher.submit(n).result()

    def decode(self, z: np.ndarray, p: np.ndarray,
               plus_space: bool = True) -> np.ndarray:
        return self._decode_batchers[bool(plus_space)].submit(
            (np.asarray(z, np.float32), np.asarray(p, np.float32))
        ).result()

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

    Any request may add {"format": "jpeg_b64"[, "quality": 90]} to get
    base64 JPEG strings instead of nested uint8 lists (~100x smaller
    responses; encoded by the native libjpeg runtime, not PIL).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    def encode_images(img: np.ndarray, req: dict):
        if req.get("format") == "jpeg_b64":
            import base64
            from transeditor_tpu.data.native import encode_jpeg
            q = int(req.get("quality", 90))
            return [base64.b64encode(encode_jpeg(im, q)).decode()
                    for im in img]
        return img.tolist()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"ok": True,
                                   "size": engine.cfg.size}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or "{}")
            except ValueError:
                self.send_error(400, "body must be JSON")
                return
            try:
                if self.path == "/sample":
                    img, zp, pp = engine.sample(int(req.get("n", 1)))
                    resp = {"images": encode_images(img, req),
                            "z_plus": zp.tolist(), "p_plus": pp.tolist()}
                elif self.path == "/decode":
                    img = engine.decode(
                        np.asarray(req["z"], np.float32),
                        np.asarray(req["p"], np.float32),
                        bool(req.get("plus_space", True)))
                    resp = {"images": encode_images(img, req)}
                elif self.path == "/edit_strip":
                    img = engine.edit_strip(
                        np.asarray(req["z_plus"], np.float32),
                        np.asarray(req["p_plus"], np.float32),
                        np.asarray(req["boundary"], np.float32),
                        space=req.get("space", "p"),
                        start=float(req.get("start", -3.0)),
                        end=float(req.get("end", 3.0)),
                        steps=int(req.get("steps", 8)))
                    resp = {"images": encode_images(img, req)}
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

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"serving on http://{host}:{port}", flush=True)
    server.serve_forever()


def engine_from_checkpoint(cfg: ModelConfig, ckpt: Optional[str] = None,
                           orbax_dir: Optional[str] = None,
                           step: Optional[int] = None,
                           seed: int = 0) -> InferenceEngine:
    """Build an engine from a reference ``.pt`` or an orbax train-state
    dir (uses g_ema)."""
    if (ckpt is None) == (orbax_dir is None):
        raise ValueError("pass exactly one of ckpt / orbax_dir")
    if ckpt:
        from transeditor_tpu.io.checkpoint import load_reference_generator
        params = load_reference_generator(ckpt, cfg)
    else:
        from transeditor_tpu.io.checkpoint import restore_train_state
        from transeditor_tpu.train.gan import TrainConfig, init_state
        template = init_state(cfg, TrainConfig(), jax.random.PRNGKey(0))
        state, got = restore_train_state(orbax_dir, template, step)
        print(f"serving g_ema from step {got}")
        params = {"params": state.g_ema}
    return InferenceEngine(cfg, params, seed=seed)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--orbax_dir", type=str, default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--warmup", type=int, default=64,
                   help="pre-compile pow2 batch programs up to this "
                        "size before serving (0 disables)")
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(p, dtype_default="bfloat16")
    args = p.parse_args(argv)
    cfg = model_config_from_args(args)
    engine = engine_from_checkpoint(cfg, args.ckpt, args.orbax_dir,
                                    args.step)
    if args.warmup > 0:
        t0 = time.time()
        print(f"warming up programs to batch {args.warmup}...",
              flush=True)
        engine.warmup(args.warmup)
        print(f"warmup done in {time.time() - t0:.1f}s", flush=True)
    run_http_server(engine, args.host, args.port)


if __name__ == "__main__":
    main()
