import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.serve import InferenceEngine, _pad_pow2

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


def test_pad_pow2():
    assert _pad_pow2(1) == 1
    assert _pad_pow2(3) == 4
    assert _pad_pow2(65) == 128


def test_large_requests_chunk_not_truncate(monkeypatch):
    """A merged request bigger than the device-batch cap must run in
    chunks and return EVERY image (regression: the pow2 cap used to
    silently truncate sample() and crash decode())."""
    import transeditor_tpu.serve as serve_mod
    monkeypatch.setattr(serve_mod, "_MAX_DEVICE_BATCH", 4)

    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params)

    img, zp, pp = eng.sample(11)           # 4+4+3 device chunks
    assert img.shape == (11, 16, 16, 3)
    assert zp.shape == (11, 16, 32) and np.isfinite(zp).all()
    # all chunks sampled with distinct keys -> no duplicated images
    assert not np.array_equal(img[0], img[4])

    dec = eng.decode(zp, pp, plus_space=True)
    assert dec.shape == (11, 16, 16, 3)
    np.testing.assert_allclose(dec.astype(int), img.astype(int), atol=1)


def test_engine_endpoints():
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params)

    img, zp, pp = eng.sample(3)
    assert img.shape == (3, 16, 16, 3) and img.dtype == np.uint8
    assert zp.shape == (3, 16, 32)

    dec = eng.decode(zp, pp, plus_space=True)
    assert dec.shape == (3, 16, 16, 3)
    # decode(sample's plus codes) reproduces the sampled images
    np.testing.assert_allclose(dec.astype(int), img.astype(int), atol=1)

    # boundaries live in the flattened token space [1, 16*D]
    boundary = np.random.RandomState(0).randn(1, 16 * 32).astype(np.float32)
    boundary /= np.linalg.norm(boundary)
    strip = eng.edit_strip(zp[0], pp[0], boundary, space="p", steps=5)
    assert strip.shape == (5, 16, 16, 3)


def test_warmup_precompiles_program_ladder():
    """warmup() fills the pow2 jit caches so no request-path compile
    remains for batches <= max_batch."""
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params)
    # NOTE: lru_cache on methods is class-level (keyed on self), so
    # measure DELTAS to stay independent of other tests' engines.
    s0 = eng._sample_fn.cache_info().currsize
    d0 = eng._decode_fn.cache_info().currsize
    eng.warmup(max_batch=4)
    assert eng._sample_fn.cache_info().currsize - s0 == 3   # 1, 2, 4
    assert eng._decode_fn.cache_info().currsize - d0 == 6   # x plus T/F
    warm = eng._sample_fn.cache_info().currsize
    img, _, _ = eng.sample(3)                               # pads to 4
    assert img.shape == (3, 16, 16, 3)
    assert eng._sample_fn.cache_info().currsize == warm     # no new program


def test_request_coalescing():
    """Concurrent decode requests merge into fewer device dispatches
    and return per-request slices identical to serial calls."""
    from concurrent.futures import ThreadPoolExecutor

    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params, coalesce_window_ms=50.0)

    rng = np.random.RandomState(3)
    reqs = [(rng.randn(2, 16, 32).astype(np.float32),
             rng.randn(2, 16, 32).astype(np.float32)) for _ in range(6)]
    serial = [eng.decode(zc, pc) for zc, pc in reqs]
    calls_before = eng._decode_batchers[True].calls

    with ThreadPoolExecutor(8) as ex:
        parallel = list(ex.map(lambda a: eng.decode(*a), reqs))
    merged_calls = eng._decode_batchers[True].calls - calls_before

    for s, q in zip(serial, parallel):
        np.testing.assert_array_equal(s, q)
    assert merged_calls < len(reqs), merged_calls


def test_http_server_endpoints():
    """Drive the real HTTP surface: /health, /sample, /decode."""
    import http.client
    import threading as th

    from transeditor_tpu.serve import run_http_server

    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    params = g.init(jax.random.PRNGKey(0), z, z)
    eng = InferenceEngine(CFG, params)

    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    th.Thread(target=run_http_server, args=(eng, "127.0.0.1", port),
              daemon=True).start()

    import json as js
    import time as t
    conn = None
    for _ in range(50):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=30)
            conn.request("GET", "/health")
            assert js.loads(conn.getresponse().read())["ok"]
            break
        except OSError:
            t.sleep(0.1)
    assert conn is not None

    conn.request("POST", "/sample", js.dumps({"n": 2}))
    out = js.loads(conn.getresponse().read())
    img = np.asarray(out["images"], np.uint8)
    assert img.shape == (2, 16, 16, 3)

    conn.request("POST", "/decode",
                 js.dumps({"z": out["z_plus"], "p": out["p_plus"]}))
    dec = np.asarray(js.loads(conn.getresponse().read())["images"],
                     np.uint8)
    np.testing.assert_allclose(dec.astype(int), img.astype(int), atol=1)

    # jpeg_b64 format: ~100x smaller responses via the native encoder
    conn.request("POST", "/sample",
                 js.dumps({"n": 1, "format": "jpeg_b64", "quality": 95}))
    out2 = js.loads(conn.getresponse().read())
    assert isinstance(out2["images"][0], str)
    import base64
    from transeditor_tpu.data.native import decode_jpeg
    raw = base64.b64decode(out2["images"][0])
    assert raw[:2] == b"\xff\xd8"
    img2 = decode_jpeg(raw, CFG.size, CFG.size)
    assert img2.shape == (16, 16, 3)
