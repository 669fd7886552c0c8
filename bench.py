"""Benchmark: 256px sampling throughput on the local accelerator.

Measures the headline BASELINE.md metric — generated images/sec for the
flagship 256px generator (g_ema inference path, bf16 synthesis) — and
prints ONE JSON line.  ``vs_baseline`` is relative to the north-star
target of 5,000 img/s/chip (BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_zp


def main():
    cfg = ModelConfig(size=256, dtype="bfloat16")
    gen = Generator(cfg)

    batch = 64
    z = jnp.zeros((batch, cfg.n_tokens, cfg.style_dim), jnp.float32)
    p = jnp.zeros((batch, cfg.n_tokens, cfg.param_dim), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), z, p)

    @jax.jit
    def sample(params, key):
        z, p = sample_zp(key, batch, cfg.n_tokens, cfg.style_dim)
        return gen.apply(params, z, p).image

    key = jax.random.PRNGKey(1)
    # warmup / compile
    jax.block_until_ready(sample(params, key))

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = sample(params, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "sampling_throughput_256px",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
