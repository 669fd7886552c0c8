"""Learn-evidence gates (VERDICT r2 #1).

The reference's loop demonstrably converges (it produced ``790000.pt``
over 800k iters, ``train_spatial_query.py:125-371``); one-step parity
oracles cannot catch slow divergence from optimizer-state threading,
EMA wiring, or reg-cadence interactions.  Two gates:

* ``test_tiny_gan_reduces_color_moment`` — trains a tiny model from
  scratch ON THIS BOX for a few hundred full-cadence steps against an
  easy color distribution and asserts the generated pixel moments move
  toward the data.  Slow (compiles 4 step variants) but hermetic.
* ``test_committed_convergence_evidence`` — pins the committed
  artifacts of the 4000-step v5e convergence run
  (``scripts/convergence_run.py`` -> ``docs/convergence/``): FID trend
  down, encoder val-loss descent.
"""

import json
import os

import jax
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig, TrainConfig

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "convergence")


def _color_moment_distance(a, b):
    fa = a.reshape(-1, 3).astype(np.float64)
    fb = b.reshape(-1, 3).astype(np.float64)
    return float(np.linalg.norm(fa.mean(0) - fb.mean(0))
                 + np.linalg.norm(np.cov(fa.T) - np.cov(fb.T)))


@pytest.mark.slow
def test_tiny_gan_reduces_color_moment(tmp_path):
    import jax.numpy as jnp

    from transeditor_tpu.models import Generator
    from transeditor_tpu.train.gan import init_state, make_train_step
    from transeditor_tpu.utils.sampling import sample_zp

    cfg = ModelConfig(size=16, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1)
    tcfg = TrainConfig(batch_size=4)
    gen = Generator(cfg)

    # easy target: smooth two-tone vertical gradients in a narrow hue
    # band (well inside what a 16px synthesis stack can model)
    rng = np.random.RandomState(0)
    yy = np.linspace(0, 1, cfg.size, dtype=np.float32)[None, :, None,
                                                       None]
    top = np.array([0.8, 0.3, 0.2], np.float32) \
        + rng.randn(256, 1, 1, 3).astype(np.float32) * 0.05
    bot = np.array([0.1, 0.2, 0.6], np.float32) \
        + rng.randn(256, 1, 1, 3).astype(np.float32) * 0.05
    data = np.clip(top * (1 - yy) + bot * yy, 0, 1) * 2.0 - 1.0
    # broadcast the [N, H, 1, 3] gradient across the width axis
    data = np.ascontiguousarray(
        np.broadcast_to(data, (len(data), cfg.size, cfg.size, 3)))

    step_fn = make_train_step(cfg, tcfg)
    state = init_state(cfg, tcfg, jax.random.PRNGKey(0))

    @jax.jit
    def sample64(params, key):
        z, p = sample_zp(key, 64, cfg.n_tokens, cfg.style_dim)
        return gen.apply({"params": params}, z, p).image

    def moment_dist(state, tag):
        img = np.asarray(sample64(state.g_ema, jax.random.PRNGKey(9)),
                         np.float32)
        return _color_moment_distance(img, data)

    d0 = moment_dist(state, "init")
    key = jax.random.PRNGKey(1)
    for i in range(400):
        key, k = jax.random.split(key)
        real = jnp.asarray(data[rng.randint(0, len(data),
                                            tcfg.batch_size)])
        state, _ = step_fn(state, real, k,
                           do_d_reg=(i % tcfg.d_reg_every == 0),
                           do_g_reg=(i % tcfg.g_reg_every == 0),
                           do_spatial_reg=False)
    dN = moment_dist(state, "end")
    # loose on purpose: a tiny GAN is noisy, but 400 steps against this
    # target reliably at least halves the moment distance; divergence /
    # dead EMA / optimizer mis-threading all FAIL this
    assert np.isfinite(dN)
    assert dN < 0.8 * d0, (d0, dN)


def trend_envelope_ok(cms, *, deep=0.1, slack=1.25):
    """Envelope gate on a weight-free color-moment trend (VERDICT r4
    #2): the run must reach DEEP (best-so-far < ``deep`` x init) and
    must END near its best (final <= ``slack`` x best).  This replaces
    the old "never three consecutive increases" rule, which round 4's
    committed regression (0.106 at step 1000 -> 0.274 at step 2500)
    passed on a technicality."""
    init, best, final = cms[0], min(cms[1:]), cms[-1]
    return bool(best < deep * init and final <= slack * best)


def test_envelope_gate_bites_on_r4_regression():
    """The gate must FAIL the round-4 trend it was built to catch
    (docs/convergence/trend_256.json as committed in 12c2029: ends
    2.6x above its own step-1000 best)."""
    r4_cms = [1.6521342877199627, 0.6012206065082607,
              0.10568612477735628, 0.19642361086514848,
              0.28136688076238014, 0.27412183495326903]
    assert not trend_envelope_ok(r4_cms)


def test_committed_convergence_evidence_256():
    """VERDICT r3 #2/#3 + r4 #1/#2: the FLAGSHIP 256px config learns
    over >=10k full-cadence steps on the v5e (envelope gate: deep best
    + ends near best), with per-segment D/G-loss and reg-magnitude
    traces committed alongside so any regression is diagnosable, and
    the encoder phase descends under the FULL reference loss
    (id + w_norm + fake guidance all firing)."""
    trend_p = os.path.join(DOCS, "trend_256.json")
    enc_p = os.path.join(DOCS, "encoder_curve_256.json")
    if not (os.path.exists(trend_p) and os.path.exists(enc_p)):
        pytest.skip("256px convergence artifacts not yet committed")
    trend = json.load(open(trend_p))
    assert trend[0]["tag"] == "step0" and len(trend) >= 4
    # extended run: >=10k cumulative steps (VERDICT r4 #1)
    assert int(trend[-1]["tag"].removeprefix("step")) >= 10_000, \
        trend[-1]["tag"]
    cms = [r["color_moment"] for r in trend]
    assert trend_envelope_ok(cms), cms
    # the random-feature Fréchet trend must also end below start
    assert trend[-1]["fid"] < 0.7 * trend[0]["fid"], trend
    # diagnosability: post-step0 rows carry loss/reg traces with the
    # lazy-cadence magnitudes actually recorded
    traced = [r["trace"] for r in trend[1:] if r.get("trace")]
    assert len(traced) >= len(trend) - 2, "segment traces missing"
    for t in traced:
        for k in ("d", "g", "r1", "path"):
            assert k in t and np.isfinite(t[k]), (k, t)
    curve = json.load(open(enc_p))
    assert curve[0]["step"] == 0 and len(curve) >= 4
    # extended run (VERDICT r4 #4): >=2k steps, all full-loss terms live
    assert curve[-1]["step"] >= 2000, curve[-1]
    tail = curve[-1]
    for k in ("loss_id", "loss_w_norm", "fake_loss"):
        assert k in tail and np.isfinite(tail[k]), (k, tail)
    vals = [r["val_loss"] for r in curve]
    assert vals[-1] < 0.9 * vals[0], vals
    # monotone-with-noise: the run ends at (near) its best
    assert vals[-1] <= 1.1 * min(vals), vals
    # the guidance term's own objective must DESCEND now that it is
    # logged in f32 (it was bf16-quantized flat in round 4): fitted
    # slope negative and last below first
    fl = [r["fake_loss"] for r in curve if "fake_loss" in r]
    assert len(fl) >= 10
    assert np.polyfit(range(len(fl)), fl, 1)[0] < 0, fl
    assert fl[-1] < fl[0], (fl[0], fl[-1])


def test_committed_coach_fake_guidance_ab():
    """VERDICT r4 #4's A/B: same seeds/data, fake guidance on vs off.
    The committed data supports the HONEST claim documented in
    docs/convergence/README.md: the term learns its own objective but
    buys no measurable val-reconstruction improvement at this scale
    (mean val diff ~3% in favour of OFF, final ~4% in favour of ON —
    i.e. within run noise), and it is NOT harmful.  The gate pins
    both directions of that claim."""
    on_p = os.path.join(DOCS, "encoder_curve_256.json")
    off_p = os.path.join(DOCS, "encoder_curve_256_nofake.json")
    if not (os.path.exists(on_p) and os.path.exists(off_p)):
        pytest.skip("coach A/B artifacts not yet committed")
    on = json.load(open(on_p))
    off = json.load(open(off_p))
    assert on[0]["val_loss"] == off[0]["val_loss"]  # same init
    assert on[-1]["step"] == off[-1]["step"] >= 2000
    fin_on, fin_off = on[-1]["val_loss"], off[-1]["val_loss"]
    # both configurations converge hard (<=0.1x init)
    assert fin_on < 0.1 * on[0]["val_loss"], (fin_on, on[0])
    assert fin_off < 0.1 * off[0]["val_loss"], (fin_off, off[0])
    # neither direction is a regression beyond run noise (15%)
    assert abs(fin_on - fin_off) <= 0.15 * fin_off, (fin_on, fin_off)


def test_committed_trained_eval_discrimination():
    """VERDICT r4 #3: the FID/PRDC/PPL/LPIPS stacks, driven through
    cli.evaluate on the trained 256px checkpoint vs its step-0 init
    (scripts/eval_trained_vs_init.py), must DISCRIMINATE decisively —
    the reference's own per-checkpoint quality loop
    (metrics/evaluate_query.py:315-391) depends on exactly this."""
    p = os.path.join(DOCS, "eval_trained_vs_init_r5.json")
    if not os.path.exists(p):
        pytest.skip("trained-vs-init eval artifact not yet committed")
    r = json.load(open(p))
    assert r["trained_step"] >= 10_000
    d = r["discrimination"]
    assert d["fid_ratio_trained_over_init"] < 0.05, d
    tr, it = r["trained"], r["init"]
    # trained has a real manifold; init (noise) has none
    assert tr["prdc"]["precision"] > 0.5 > it["prdc"]["precision"], \
        (tr["prdc"], it["prdc"])
    assert tr["prdc"]["coverage"] > 0.5 > it["prdc"]["coverage"], \
        (tr["prdc"], it["prdc"])
    # plus-space PPL: the trained latent space is far smoother
    assert tr["ppl"]["all"] < 0.5 * it["ppl"]["all"], (tr["ppl"],
                                                      it["ppl"])
    ps = r["protocol_sizes"]
    assert ps["fid_samples"] >= 4096 and ps["prdc_samples"] >= 4096
    assert ps["ppl_samples"] >= 2048


def test_committed_edit_on_trained_evidence():
    """VERDICT r4 #8: the InterfaceGAN pipeline (sample -> scores ->
    dual Z+/P+ SVM boundaries -> 3-space strips -> evaluation) driven
    on the NATIVELY TRAINED 256px checkpoint
    (scripts/edit_on_trained.py; reference
    our_interfaceGAN/edit_all_noinversion_ffhq.py:179-286).  Classifier
    weights stay fabricated (the artifact says so); the generator is
    the real trained one."""
    p = os.path.join(DOCS, "edit_on_trained_r5.json")
    if not os.path.exists(p):
        pytest.skip("edit-on-trained artifact not yet committed")
    r = json.load(open(p))
    assert r["ckpt"].startswith("trained_") and r["num_sample"] >= 1000
    assert r["n_strip_pngs"] >= 100 and r["n_boundary_files"] >= 2
    # dual-space disentanglement on the trained model: the Z+ and P+
    # boundaries are near-orthogonal
    cos = list(r["edit_eval"]["boundary_cosine"].values())[0]
    assert abs(cos) < 0.3, cos
    assert "fabricated" in r["caveat"]


def test_committed_reverse_interop_evidence():
    """VERDICT r3 #7: a NATIVELY TRAINED 256px checkpoint exported to
    the reference .pt layout loads strict=True in the reference
    Generator (torch-CPU) and matches our forward pixel-for-pixel
    (scripts/reverse_interop.py)."""
    p = os.path.join(DOCS, "reverse_interop_r4.json")
    if not os.path.exists(p):
        pytest.skip("reverse-interop artifact not yet committed")
    r = json.load(open(p))
    assert r["size"] == 256 and r["strict_load"] is True
    assert r["step"] > 0
    assert r["mean_abs_err"] < 1e-3, r
    # consumer-visible bound: both sides quantized the way reference
    # scripts save images; <=2/255 per pixel
    assert r["uint8_delta_max"] <= 2, r


def test_committed_convergence_evidence():
    trend_p = os.path.join(DOCS, "trend.json")
    enc_p = os.path.join(DOCS, "encoder_curve.json")
    if not (os.path.exists(trend_p) and os.path.exists(enc_p)):
        pytest.skip("convergence artifacts not yet committed")
    trend = json.load(open(trend_p))
    assert trend[0]["tag"] == "step0" and len(trend) >= 3
    f0, fN = trend[0]["fid"], trend[-1]["fid"]
    c0, cN = trend[0]["color_moment"], trend[-1]["color_moment"]
    assert fN < 0.7 * f0, (f0, fN)
    assert cN < 0.7 * c0, (c0, cN)
    curve = json.load(open(enc_p))
    assert curve[0]["step"] == 0 and len(curve) >= 4
    v0, vN = curve[0]["val_loss"], curve[-1]["val_loss"]
    assert vN < 0.9 * v0, (v0, vN)
