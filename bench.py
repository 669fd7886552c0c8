"""Benchmark: 256px sampling throughput on the local accelerator.

Measures the BASELINE.md headline metric — generated images/sec for the
flagship 256px generator (g_ema inference path, bf16 synthesis) — and
prints ONE JSON line; ``vs_baseline`` is relative to the 5,000
img/s/chip north-star target.

Multi-chip: when more than one device is visible the batch shards over
a (data,) mesh — BATCH images per chip — and the reported value stays
per-chip, so the number is comparable across topologies.  (On the
tunnelled single v5e this is a no-op; `tests/test_bench_mesh.py`
validates the sharded path on the 8-virtual-device CPU mesh.)

Methodology notes for the axon-tunnelled TPU:
  * ``block_until_ready`` does not actually block on this experimental
    backend, so timing closes over a device->host SCALAR fetch of a
    checksum that depends on every generated image;
  * ITERS sampling rounds run inside one ``lax.scan`` program so tunnel
    dispatch latency (~30ms RTT) is amortised out of the measurement —
    this is also the realistic serving shape (steady-state pipelined
    batches, no host round-trip per batch).
"""

import contextlib
import json
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_zp

BATCH_PER_CHIP = 256
ITERS_PER_CALL = 8
TARGET = 5000.0


def build_sampler(cfg: ModelConfig, batch_per_chip: int, iters: int,
                  mesh=None, init_params: bool = True):
    """Returns (params, jitted sample_many(params, key) -> checksum).

    With a mesh, every sampled batch is constrained to shard over its
    'data' axis (batch_per_chip images per device) and the params ride
    replicated — the nn.DataParallel-eval analogue, XLA-style.

    ``init_params=False`` returns ShapeDtypeStructs instead of concrete
    parameters (for AOT ``sample_many.lower(...)`` compile-only checks).
    """
    gen = Generator(cfg)
    z0 = jnp.zeros((1, cfg.n_tokens, cfg.style_dim), jnp.float32)
    if init_params:
        params = jax.jit(gen.init)(jax.random.PRNGKey(0), z0, z0)
    else:
        params = jax.eval_shape(gen.init, jax.random.PRNGKey(0), z0, z0)

    n_dev = 1
    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from transeditor_tpu.parallel.mesh import replicated
        n_dev = mesh.shape["data"]
        constraint = NamedSharding(mesh, P("data"))
        if init_params:
            params = jax.device_put(params, replicated(mesh))
        else:
            params = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(
                    s.shape, s.dtype, sharding=replicated(mesh)), params)
    batch = batch_per_chip * n_dev

    @jax.jit
    def sample_many(params, key):
        def body(carry, i):
            zz, pp = sample_zp(jax.random.fold_in(key, i), batch,
                               cfg.n_tokens, cfg.style_dim)
            if constraint is not None:
                zz = jax.lax.with_sharding_constraint(zz, constraint)
                pp = jax.lax.with_sharding_constraint(pp, constraint)
            img = gen.apply(params, zz, pp).image
            return carry + jnp.sum(img.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
        return total

    return params, sample_many, batch


def main():
    cfg = ModelConfig(size=256, dtype="bfloat16")
    devices = jax.devices()
    mesh = None
    if len(devices) > 1:
        from transeditor_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(n_data=len(devices), n_model=1)
    params, sample_many, batch = build_sampler(
        cfg, BATCH_PER_CHIP, ITERS_PER_CALL, mesh)

    key = jax.random.PRNGKey(1)
    # warmup: compile + first execution (fetch forces completion)
    float(np.asarray(sample_many(params, key)))

    # the tunnelled chip shows high run-to-run variance (shared
    # backend); measure several windows and report best + median + std
    # (VERDICT r4 #7: a single number hid the documented variance)
    dts = []
    for i in range(5):
        t0 = time.perf_counter()
        acc = float(np.asarray(sample_many(params,
                                           jax.random.fold_in(key, i))))
        dts.append(time.perf_counter() - t0)
        assert np.isfinite(acc)
    best_dt = min(dts)

    n_chips = max(1, len(devices) if mesh else 1)
    per_window = [batch * ITERS_PER_CALL / dt / n_chips for dt in dts]
    imgs_per_sec_per_chip = max(per_window)
    variance_fields = {
        "value_median": round(float(np.median(per_window)), 2),
        "value_std": round(float(np.std(per_window)), 2),
        "n_reps": len(per_window),
    }

    # context extras, each hard-bounded by an alarm so a tunnel stall
    # can never cost the primary line; failures silently skip a field
    extras = {}

    @contextlib.contextmanager
    def bounded(seconds):
        def _raise(signum, frame):
            raise TimeoutError
        old = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(seconds)
        try:
            yield
        except TimeoutError:
            print(f"bench: extras block timed out after {seconds}s "
                  "(tunnel stall?) — skipping field", file=sys.stderr)
        except Exception as e:
            # a genuine API/shape regression must be visible, not
            # indistinguishable from a tunnel stall
            print(f"bench: extras block failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    # MFU of the sampling program, from XLA's own cost model: the
    # honest "fraction of this chip" companion to the absolute img/s
    # (vs_baseline compares against a 5,000 img/s north star that is
    # 229% of v5e bf16 peak for this 90-GFLOP/image model — see
    # BASELINE.md; MFU is the signal that can actually reach 1.0)
    with bounded(120):
        cost = sample_many.lower(params, key).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        # XLA's cost model counts a lax.scan body ONCE (trip count is
        # opaque at HLO level) — scale to the executed iterations
        # (validated against the captured device trace: 138 TFLOP/s
        # effective = 70% MFU, docs/perf/TRACE_ANALYSIS.md)
        flops = float(cost["flops"]) * ITERS_PER_CALL
        extras["sampling_mfu_bf16"] = round(
            flops / best_dt / 197e12, 4)

    # training-step throughput (the production 800k-iteration recipe,
    # reference train_spatial_query.py:125-371): plain, each reg alone,
    # and full-reg — the reg-only variants make the sustained-cadence
    # mix EXACT (p + extra_g/4 + extra_d/16) instead of a 50/50 split
    # of the combined extra cost
    with bounded(540):
        from transeditor_tpu.config import TrainConfig
        from transeditor_tpu.train.gan import init_state, make_train_step
        tcfg = TrainConfig(batch_size=16)
        t_state = jax.jit(lambda k: init_state(cfg, tcfg, k))(
            jax.random.PRNGKey(7))
        t_step = make_train_step(cfg, tcfg)
        t_real = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (16, cfg.size, cfg.size, 3), np.uint8))

        @jax.jit
        def t_sum(m):
            return sum(jnp.sum(v) for v in jax.tree.leaves(m))

        for name, kw in (("plain", {}),
                         ("dreg", dict(do_d_reg=True)),
                         ("greg", dict(do_g_reg=True)),
                         ("fullreg", dict(do_d_reg=True, do_g_reg=True))):
            s, m = t_step(t_state, t_real, jax.random.PRNGKey(8), **kw)
            float(np.asarray(t_sum(m)))      # compile + settle
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                s = t_state
                for i in range(5):
                    s, m = t_step(s, t_real,
                                  jax.random.fold_in(jax.random.PRNGKey(9),
                                                     rep * 5 + i), **kw)
                float(np.asarray(t_sum(m)))
                best = min(best, (time.perf_counter() - t0) / 5)
            extras[f"train_{name}_ms"] = round(best * 1e3, 1)
        if all(f"train_{n}_ms" in extras
               for n in ("plain", "dreg", "greg", "fullreg")):
            # lazy-reg cadence: d-reg every 16, g-reg every 4 → the
            # sustained mix, EXACT per-variant extras (reference :381-391)
            p = extras["train_plain_ms"]
            eg = max(0.0, extras["train_greg_ms"] - p)
            ed = max(0.0, extras["train_dreg_ms"] - p)
            mix = p + eg / 4 + ed / 16
            extras["train_img_s_sustained_est"] = round(16 / (mix / 1e3), 1)

    print(json.dumps({
        "metric": "sampling_throughput_256px",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / TARGET, 4),
        **variance_fields,
        **extras,
    }))


if __name__ == "__main__":
    main()
