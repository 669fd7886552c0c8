"""Benchmark: 256px sampling throughput on the local accelerator.

Measures the BASELINE.md headline metric — generated images/sec for the
flagship 256px generator (g_ema inference path, bf16 synthesis) — and
prints ONE JSON line; ``vs_baseline`` is relative to the 5,000
img/s/chip north-star target.

Methodology notes for the axon-tunnelled TPU:
  * ``block_until_ready`` does not actually block on this experimental
    backend, so timing closes over a device->host SCALAR fetch of a
    checksum that depends on every generated image;
  * ITERS sampling rounds run inside one ``lax.scan`` program so tunnel
    dispatch latency (~30ms RTT) is amortised out of the measurement —
    this is also the realistic serving shape (steady-state pipelined
    batches, no host round-trip per batch).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_zp

BATCH = 256
ITERS_PER_CALL = 8
TARGET = 5000.0


def main():
    cfg = ModelConfig(size=256, dtype="bfloat16")
    gen = Generator(cfg)

    z0 = jnp.zeros((BATCH, cfg.n_tokens, cfg.style_dim), jnp.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), z0, z0)

    @jax.jit
    def sample_many(params, key):
        def body(carry, i):
            zz, pp = sample_zp(jax.random.fold_in(key, i), BATCH,
                               cfg.n_tokens, cfg.style_dim)
            img = gen.apply(params, zz, pp).image
            return carry + jnp.sum(img.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(ITERS_PER_CALL))
        return total

    key = jax.random.PRNGKey(1)
    # warmup: compile + first execution (fetch forces completion)
    float(np.asarray(sample_many(params, key)))

    # the tunnelled chip shows high run-to-run variance (shared
    # backend); report the best of several windows
    best_dt = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        acc = float(np.asarray(sample_many(params,
                                           jax.random.fold_in(key, i))))
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert np.isfinite(acc)

    imgs_per_sec = BATCH * ITERS_PER_CALL / best_dt
    print(json.dumps({
        "metric": "sampling_throughput_256px",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
