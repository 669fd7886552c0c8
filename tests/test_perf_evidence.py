"""Gates on committed round-3 performance-evidence artifacts.

Like ``test_convergence.py::test_committed_convergence_evidence``,
these pin the committed protocol-scale report and train-trace analysis
(BASELINE.md / docs/perf) so a regression that silently drops or
mangles the evidence fails the suite, and the documented numbers stay
attached to machine-checkable files.
"""

import gzip
import json
import os

import pytest

PERF = os.path.join(os.path.dirname(__file__), "..", "docs", "perf")


def _load(name):
    p = os.path.join(PERF, name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not committed")
    with open(p) as f:
        return json.load(f)


def test_protocol_scale_report_complete():
    """One pass at the reference's protocol sizes completed on the v5e
    (VERDICT r2 #3); every phase present with sane wall/RSS."""
    rows = {r["phase"]: r for r in _load("protocol_scale_r3.json")}
    for phase in ("data", "real_stats", "fid", "prdc",
                  "ppl_all", "ppl_p", "ppl_z", "lpips_diversity"):
        assert phase in rows, phase
        r = rows[phase]
        assert 0 < r["wall_s"] < 6 * 3600
        assert 0 < r["peak_rss_mb"] < 128 * 1024
    assert rows["data"]["images"] == 50_000
    assert rows["fid"]["samples"] == 69_000
    assert rows["prdc"]["samples"] == 50_000
    assert rows["ppl_all"]["samples"] == 10_000
    assert rows["lpips_diversity"]["batches"] == 1000
    # the uint8-upload fix held: the PRDC pass (50k real uploads + two
    # 820 MB feature stores) stays bounded in absolute terms.  (An
    # absolute bound, not a cross-phase comparison: VmHWM is monotonic
    # within a process, so if the report is ever regenerated with
    # real_stats and prdc in one process the later phase's high-water
    # mark necessarily >= the earlier one's.)
    assert rows["prdc"]["peak_rss_mb"] < 25 * 1024


def test_train_trace_analysis_sane():
    """The train-step trace treatment (VERDICT r2 #5): both variants
    traced, device-busy, MFU and roofline numbers in credible ranges."""
    a = _load("trace_r3_train_analysis.json")
    for tag in ("plain", "fullreg"):
        v = a[tag]
        assert v["wall_ms_per_step"] > v["device_ms_per_step"] > 0
        # device busy >= 90% of wall
        assert v["device_ms_per_step"] / v["wall_ms_per_step"] > 0.9
        assert 0.3 < v["mfu_vs_bf16_peak"] < 1.0
        assert v["total_tflops_per_step"] > 10
        assert len(v["top_ops"]) >= 10
    # full-reg (two extra grad-of-grad passes) must cost measurably more
    assert (a["fullreg"]["total_tflops_per_step"]
            > 1.5 * a["plain"]["total_tflops_per_step"])


def test_flagship_mesh_compile_report():
    """VERDICT r3 #1b (r5 refresh): the FLAGSHIP 256px train step
    (plain, full-reg, FSDP, pure-DP) and the batch-256 sampling program
    compiled on the 8-virtual-device mesh with ZERO spmd_partitioner
    resharding warnings (scripts/flagship_mesh_compile.py) — now with
    the round-5 sampled-batch sharding constraint in force."""
    r = _load("flagship_mesh_compile_r5.json")
    assert r["size"] == 256 and r["batch_per_chip"] == 16
    for variant in ("plain", "fullreg", "fullreg_fsdp", "fullreg_dp8",
                    "sampling_b256"):
        assert variant in r, variant
        assert r[variant]["compile_s"] > 0
        assert r[variant]["spmd_warnings"] == 0, r[variant]
    assert r["total_spmd_warnings"] == 0
    # full-reg adds the two grad-of-grad passes: it must cost more to
    # compile-analyze than plain if both really lowered the whole step
    if "flops_per_device" in r["fullreg"] and "flops_per_device" in r["plain"]:
        assert r["fullreg"]["flops_per_device"] > r["plain"]["flops_per_device"]
    # the round-5 regression guard for the replicated-sampled-batch
    # defect: per-device FLOPs of the dp8 full-reg step must stay close
    # to the (4,2) full-reg step's (the unfixed program was ~1.9x)
    f_dp8 = r["fullreg_dp8"].get("flops_per_device")
    f_tp = r["fullreg"].get("flops_per_device")
    if f_dp8 and f_tp:
        assert f_dp8 < 1.3 * 2 * f_tp, (f_dp8, f_tp)


def test_deviceless_tpu_aot_report():
    """Round 5: the flagship multi-chip variants compiled with the REAL
    XLA:TPU compiler against a deviceless v5e:2x4 topology — per-chip
    buffer assignment from the backend that will run them.  All must
    fit a 16 GB v5e at batch 16/chip (scripts/deviceless_tpu_aot.py;
    this compile is what caught the replicated-sampled-batch defect)."""
    r = _load("deviceless_tpu_aot_r5.json")
    assert r["batch_per_chip"] == 16 and r["size"] == 256
    for name in ("fullreg_dp8", "fullreg_tp2", "fullreg_tp2_fsdp"):
        v = r[name]
        assert "error" not in v, v
        assert v["fits_16g_v5e"] is True, (name, v)
        assert 2 * 1024 ** 3 < v["est_peak_bytes_donated"] < 8 * 1024 ** 3
    # dp8 runs the whole 16-image microbatch per chip; tp=2 splits the
    # model dim, so its per-device FLOPs must be LOWER than dp8's
    assert (r["fullreg_tp2"]["flops_per_device"]
            < r["fullreg_dp8"]["flops_per_device"])


def test_flagship_multihost_compile_report():
    """VERDICT r4 #5: the flagship 256px full-reg step compiled under a
    REAL 2-process jax.distributed mesh (2 hosts x 4 virtual devices)
    with zero GSPMD warnings on BOTH ranks, and collective-byte
    accounting byte-identical to the single-process certification
    (scripts/flagship_multihost_compile.py)."""
    r = _load("flagship_multihost_compile_r5.json")
    assert r["topology"].startswith("2 processes")
    assert r["size"] == 256 and r["batch_per_chip"] == 16
    assert r["total_spmd_warnings"] == 0
    for name in ("fullreg", "fullreg_dp8"):
        assert r[name]["compile_s_rank0"] > 0
        assert r[name]["compile_s_rank1"] > 0
        assert r[name]["spmd_warnings"] == 0
        cmp = r["vs_single_process"][name]
        assert cmp["match"] is True, cmp
        assert cmp["multihost_bytes"] == cmp["single_process_bytes"] > 0


def test_bench_numbers_consistent_with_trace_evidence():
    """VERDICT r3 #6: the driver-visible BENCH_r*.json line must stay
    within tolerance of the committed trace-derived evidence, so the
    headline numbers can't silently drift from the artifacts that back
    them.  Reads the LATEST committed BENCH_r*.json."""
    import glob
    root = os.path.join(os.path.dirname(__file__), "..")
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not benches:
        pytest.skip("no BENCH_r*.json committed")
    with open(benches[-1]) as f:
        bench = json.load(f)
    parsed = bench.get("parsed") or {}
    if not parsed:
        # driver recorded a failed run — the rc gate is the driver's.
        # Best-effort: find the metric line in the tail; anything that
        # doesn't parse as our JSON line (tracebacks with braces, log
        # noise) means there is nothing to gate — skip, don't error.
        parsed = None
        for line in reversed(bench.get("tail", "").splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if isinstance(cand, dict) and "metric" in cand:
                    parsed = cand
                    break
        if parsed is None:
            pytest.skip("latest BENCH has no parsed payload")
    trace = _load("trace_r3_train_analysis.json")
    # train-step timings: bench (same-process best-of windows) vs the
    # trace's wall_ms_per_step — the shared chip has real variance, so
    # 30% tolerance, but an order-of-magnitude drift must fail
    for name, tag in (("train_plain_ms", "plain"),
                      ("train_fullreg_ms", "fullreg")):
        if name not in parsed:
            continue  # bounded() skipped the field that round
        ref = trace[tag]["wall_ms_per_step"]
        assert abs(parsed[name] - ref) / ref < 0.30, (name, parsed[name], ref)
    # sampling MFU: the trace treatment measured ~0.70 of bf16 peak
    # (docs/perf/TRACE_ANALYSIS.md: 138 TFLOP/s effective on 197 peak)
    if "sampling_mfu_bf16" in parsed:
        assert 0.55 <= parsed["sampling_mfu_bf16"] <= 0.85, parsed
    # the headline throughput itself: the measured single-chip bf16
    # ceiling is ~1540 img/s (README journal); anything wildly off in
    # either direction means the metric changed meaning.  Gate on the
    # MEDIAN when the run-variance fields exist (VERDICT r4 #7) — the
    # median is the robust center the shared-chip variance can't fake.
    if parsed.get("unit") == "img/s/chip":
        assert 1000 < parsed["value"] < 2500, parsed
        if "value_median" in parsed:
            assert 1000 < parsed["value_median"] <= parsed["value"], parsed
            assert parsed["n_reps"] >= 3, parsed
            assert 0 <= parsed["value_std"] < 0.3 * parsed["value_median"], \
                parsed


def test_committed_traces_parse():
    """The committed trace.json.gz artifacts stay loadable with the
    device plane present (scripts/trace_train.py::analyze contract)."""
    for name in ("trace_r3_train_plain_b16.trace.json.gz",
                 "trace_r3_train_fullreg_b16.trace.json.gz"):
        p = os.path.join(PERF, name)
        if not os.path.exists(p):
            pytest.skip(f"{name} not committed")
        with gzip.open(p) as f:
            trace = json.load(f)
        names = {e["args"].get("name")
                 for e in trace.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
        assert "XLA Ops" in names and "XLA Modules" in names
