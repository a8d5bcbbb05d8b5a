"""Contract test for the judged bench artifact: `python bench.py` must print
exactly ONE stdout line, parseable as JSON, carrying the keys the driver and
BASELINE.md consumers rely on. Measurement functions are stubbed (no TPU in
the test mesh); this guards the *format*, not the numbers.
"""

import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_bench_json_line_contract(monkeypatch):
    monkeypatch.setattr(bench, "_await_device", lambda: None)
    monkeypatch.setattr(bench, "bench_ours", lambda: {
        "slides_per_sec": 5500.0, "tflops": 106.5, "latency_p50_ms": 1.14,
        "device": "TPU v5 lite0",
    })
    monkeypatch.setattr(bench, "bench_reference_pattern", lambda: 5.26)
    # extras: one succeeding, the rest raising (best-effort contract)
    monkeypatch.setattr(bench, "bench_int8", lambda: {"int8_slides_per_sec": 8000.0})
    for name in ("bench_ragged", "bench_encoder", "bench_train", "bench_long_bag",
                 "bench_patient_bag", "bench_vit", "bench_e2e_wsi", "bench_e2e_wsi_vit",
                 "bench_e2e_disk", "bench_serve", "bench_real_io_suite", "bench_reference_real"):
        monkeypatch.setattr(bench, name, _raiser(name))

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be exactly one line, got {len(lines)}: {lines}"
    out = json.loads(lines[0])

    # driver-required shape
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, key
    assert out["metric"] == "slide_inference_throughput"
    assert out["value"] == 5500.0
    assert abs(out["vs_baseline"] - 5500.0 / 5.26) < 0.02
    # judged extras + honest-framing fields survive
    for key in ("baseline_note", "baseline_slides_per_sec", "latency_p50_ms",
                "pool_tflops", "int8_slides_per_sec", "device"):
        assert key in out, key
    # cross-round headline stability (VERDICT r4 #6): the pinned denominator
    # must always ride along so round-over-round swings can't come from
    # baseline remeasurement noise
    assert out["pinned_baseline_slides_per_sec"] == 5.5
    assert abs(out["vs_baseline_pinned"] - 5500.0 / 5.5) < 0.02
    # failing extras must degrade to *_error strings, not kill the line
    assert any(k.endswith("_error") for k in out)


def _raiser(name):
    def f():
        raise RuntimeError(f"{name} unavailable in test")
    return f


def test_bench_retry_mechanics(monkeypatch):
    """_await_device: exhausted attempts exit cleanly; below the cap it
    sleeps then re-execs the same argv with the counter bumped."""
    import os
    import types

    fake_jax = types.ModuleType("jax")
    def _raise():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
    fake_jax.devices = _raise
    monkeypatch.setitem(sys.modules, "jax", fake_jax)

    monkeypatch.setenv("TOAD_BENCH_ATTEMPT", "4")
    try:
        bench._await_device()
        raise AssertionError("expected SystemExit")
    except SystemExit:
        pass

    monkeypatch.setenv("TOAD_BENCH_ATTEMPT", "2")
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.append(("sleep", s)))
    monkeypatch.setattr(os, "execv", lambda exe, argv: calls.append(("execv", exe)))
    bench._await_device()
    assert [c[0] for c in calls] == ["sleep", "execv"], calls
    assert os.environ["TOAD_BENCH_ATTEMPT"] == "3"
