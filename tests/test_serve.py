"""Serving subsystem: dynamic batcher correctness + HTTP API.

The batcher must be *transparent*: a prediction served from a coalesced
batch must match the single-bag SlideInference result bit-for-bit (same
bucket padding, same forward). The HTTP layer is driven in-process with
http.client against a port-0 server (CLAUDE.md: no subprocess JAX re-init).
"""

import base64
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from toad_tpu.config import ModelConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.pipeline.infer import SlideInference
from toad_tpu.serve import DynamicBatcher, InferenceService, ServeConfig, serve_in_thread

DIM = 64
BUCKETS = (32, 64, 128)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = ModelConfig(in_dim=DIM, n_classes=6)
    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))
    return cfg, params


def _bags(rng, count, lo=5, hi=120):
    return [
        (rng.standard_normal((int(rng.integers(lo, hi)), DIM)).astype(np.float32), int(rng.integers(0, 2)))
        for _ in range(count)
    ]


def test_batched_matches_single(model_and_params):
    cfg, params = model_and_params
    single = SlideInference(params, cfg, bucket_sizes=BUCKETS)
    rng = np.random.default_rng(0)
    bags = _bags(rng, 17)
    with DynamicBatcher(params, cfg, ServeConfig(max_batch=8, max_wait_ms=20, bucket_sizes=BUCKETS, need_attention=True)) as b:
        futures = [b.submit(f, s) for f, s in bags]
        preds = [f.result(timeout=60) for f in futures]
    for (feats, sex), pred in zip(bags, preds):
        ref = single.predict(feats, sex)
        np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
        np.testing.assert_allclose(pred.site_prob, ref.site_prob, atol=1e-5)
        np.testing.assert_allclose(pred.attention, ref.attention, atol=1e-4)
        assert pred.y_hat == ref.y_hat and pred.site_hat == ref.site_hat


def test_requests_are_coalesced(model_and_params):
    cfg, params = model_and_params
    with DynamicBatcher(params, cfg, ServeConfig(max_batch=16, max_wait_ms=200, bucket_sizes=BUCKETS)) as b:
        b.predict(np.zeros((10, DIM), np.float32), 0)  # warm the compile cache
        rng = np.random.default_rng(1)
        # same bucket so they can share one forward
        futures = [b.submit(rng.standard_normal((20, DIM)).astype(np.float32), 0) for _ in range(12)]
        for f in futures:
            f.result(timeout=60)
        s = b.stats()
    assert s.requests == 13 and s.batched_slides == 13
    assert s.batches < 13, f"no coalescing happened: {s}"


def test_oversized_bag_truncates_and_validates(model_and_params):
    cfg, params = model_and_params
    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS)) as b:
        pred = b.predict(np.random.default_rng(2).standard_normal((300, DIM)).astype(np.float32), 1)
        assert pred.y_prob.shape == (6,)
        with pytest.raises(ValueError, match="in_dim"):
            b.submit(np.zeros((10, DIM + 1), np.float32), 0)
        with pytest.raises(ValueError, match="empty"):
            b.submit(np.zeros((0, DIM), np.float32), 0)
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((10, DIM), np.float32), 0)


def _post_raw(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, json.dumps(obj), {"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    ctype = r.getheader("Content-Type")
    conn.close()
    return r.status, ctype, data


def _post(port, path, obj):
    status, _, data = _post_raw(port, path, obj)
    return status, json.loads(data)


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


@pytest.fixture(scope="module")
def http_service(model_and_params, dummy_env):
    cfg, params = model_and_params
    from toad_tpu.config import TaskConfig

    task = dummy_env["task"]
    service = InferenceService(
        params, cfg, ServeConfig(max_batch=8, max_wait_ms=5, bucket_sizes=BUCKETS), task=task
    )
    server, port = serve_in_thread(service)
    yield service, port, task
    server.shutdown()
    service.close()


def test_http_predict_features(http_service):
    service, port, task = http_service
    status, health = _get(port, "/healthz")
    assert status == 200 and health["status"] == "ok"

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((40, DIM)).astype(np.float32)
    body = {
        "features_b64": base64.b64encode(feats.astype("<f4").tobytes()).decode(),
        "shape": [40, DIM],
        "sex": "F",
        "top_k": 3,
        "attention": True,
    }
    status, out = _post(port, "/predict", body)
    assert status == 200, out
    assert len(out["topk"]) == 3 and len(out["attention"]) == 40
    inv = {v: k for k, v in task.label_dicts[0].items()}
    assert out["label"] == inv[out["y_hat"]]
    assert abs(sum(out["y_prob"]) - 1.0) < 1e-4

    # nested-list variant gives the same answer
    status2, out2 = _post(port, "/predict", {"features": feats.tolist(), "sex": 0})
    assert status2 == 200
    np.testing.assert_allclose(out2["y_prob"], out["y_prob"], atol=1e-5)


def test_http_predict_bag_path(http_service, dummy_env):
    service, port, task = http_service
    bag = next(iter(dummy_env["data_dir"].glob("*.npy")))
    status, out = _post(port, "/predict", {"bag_path": str(bag), "sex": "M"})
    assert status == 200, out
    assert out["site_label"] in task.label_dicts[1]

    status, out = _post(port, "/predict", {"bag_path": str(bag) + ".missing", "sex": "M"})
    assert status == 404

    status, out = _get(port, "/stats")
    assert status == 200 and out["requests"] >= 1 and out["mean_batch_size"] >= 1
    assert out["config"]["buckets"] == sorted(BUCKETS)
    assert out["config"]["temperature"] == 1.0 and out["config"]["int8"] is False


def test_http_bad_requests(http_service):
    _, port, _ = http_service
    status, out = _post(port, "/predict", {"sex": "F"})
    assert status == 400 and "features" in out["error"]
    status, out = _post(port, "/predict", {"features": [[0.0] * DIM], "sex": "banana"})
    assert status == 400
    status, out = _post(
        port, "/predict", {"features_b64": base64.b64encode(b"\x00" * 8).decode(), "shape": [40, DIM], "sex": 0}
    )
    assert status == 400 and "floats" in out["error"]
    status, _ = _get(port, "/nope")
    assert status == 404


def test_concurrent_http_clients_share_batches(http_service):
    service, port, _ = http_service
    before = service.stats()
    rng = np.random.default_rng(4)
    results = [None] * 10
    feats = rng.standard_normal((24, DIM)).astype(np.float32)  # one bucket
    body = {"features": feats.tolist(), "sex": 1}

    def hit(i):
        results[i] = _post(port, "/predict", body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(st == 200 for st, _ in results)
    first = results[0][1]["y_prob"]
    for _, out in results[1:]:
        np.testing.assert_allclose(out["y_prob"], first, atol=1e-5)
    after = service.stats()
    assert after["served"] - before["served"] == 10


def test_dispatch_thread_survives_forward_failure(model_and_params):
    """A failing dispatch must reject its own futures but keep the singleton
    dispatch thread alive for later requests (review finding: an unguarded
    exception killed the thread and hung every subsequent caller)."""
    cfg, params = model_and_params
    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS, max_wait_ms=5)) as b:
        good = np.zeros((10, DIM), np.float32)
        b.predict(good, 0)  # warm
        orig = b._fwd
        b._fwd = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        with pytest.raises(RuntimeError, match="boom"):
            b.predict(good, 0)
        b._fwd = orig
        pred = b.predict(good, 0)  # thread still serving
        assert pred.y_prob.shape == (6,)


def test_close_reports_drain_and_is_idempotent(model_and_params):
    cfg, params = model_and_params
    b = DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS))
    b.predict(np.zeros((10, DIM), np.float32), 0)
    assert b.close() is True
    assert b.close() is True  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((10, DIM), np.float32), 0)


def test_http_shape_validation(http_service):
    """Non-integer / wrong-dim shapes are 400s, not 500s (review finding)."""
    import base64 as b64

    _, port, _ = http_service
    payload = b64.b64encode(np.zeros(40 * DIM, "<f4").tobytes()).decode()
    status, out = _post(port, "/predict", {"features_b64": payload, "shape": [40.0, DIM], "sex": 0})
    assert status == 400 and "positive integers" in out["error"]
    status, out = _post(port, "/predict", {"features_b64": payload, "shape": [40, DIM + 1], "sex": 0})
    assert status == 400 and "in_dim" in out["error"]
    status, out = _post(port, "/predict", {"features": [0.0] * DIM, "sex": 0})  # 1-D
    assert status == 400 and "n_patches" in out["error"]


def test_stress_mixed_buckets_and_attention(model_and_params):
    """Soak: 120 concurrent requests over mixed buckets/attention flags with
    8 client threads — all complete, all match single-bag inference."""
    cfg, params = model_and_params
    single = SlideInference(params, cfg, bucket_sizes=BUCKETS)
    rng = np.random.default_rng(7)
    reqs = [
        (rng.standard_normal((int(rng.integers(4, 140)), DIM)).astype(np.float32),
         int(rng.integers(0, 2)), bool(rng.integers(0, 2)))
        for _ in range(120)
    ]
    results = [None] * len(reqs)
    with DynamicBatcher(params, cfg, ServeConfig(max_batch=16, max_wait_ms=3, bucket_sizes=BUCKETS)) as b:
        def worker(lo, hi):
            for i in range(lo, hi):
                f, s, a = reqs[i]
                results[i] = b.predict(f, s, attention=a)

        threads = [threading.Thread(target=worker, args=(i * 15, (i + 1) * 15)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = b.stats()
    assert stats.requests == 120 and stats.batched_slides == 120
    for (f, s, a), pred in zip(reqs, results):
        ref = single.predict(f, s)
        assert pred.y_hat == ref.y_hat
        np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
        expect_n = min(f.shape[0], max(BUCKETS))  # oversize bags head-truncate
        assert len(pred.attention) == (expect_n if a else 0)


def test_close_during_inflight_requests_resolves_all(model_and_params):
    """close() racing active submitters: every future resolves (result or
    'closed' error) — nothing hangs."""
    import concurrent.futures

    cfg, params = model_and_params
    b = DynamicBatcher(params, cfg, ServeConfig(max_batch=4, max_wait_ms=50, bucket_sizes=BUCKETS))
    b.predict(np.zeros((10, DIM), np.float32), 0)  # warm
    futs = []
    stop_submitting = threading.Event()

    def submitter():
        rng = np.random.default_rng(threading.get_ident() % 2**31)
        while not stop_submitting.is_set():
            try:
                futs.append(b.submit(rng.standard_normal((20, DIM)).astype(np.float32), 0))
            except RuntimeError:
                return

    threads = [threading.Thread(target=submitter) for _ in range(4)]
    for t in threads:
        t.start()
    import time as _t

    _t.sleep(0.15)
    assert b.close() is True
    stop_submitting.set()
    for t in threads:
        t.join()
    resolved = 0
    for f in futs:
        try:
            f.result(timeout=30)  # either a prediction...
            resolved += 1
        except RuntimeError:  # ...or a loud 'batcher closed'
            resolved += 1
    assert resolved == len(futs) and len(futs) > 0


def test_mesh_parallel_serving_matches_single_device(model_and_params):
    """Serving over a (4 data x 2 bag) mesh returns the same predictions as
    single-device serving; batch dim pads to the data axis."""
    from toad_tpu.parallel.mesh import make_mesh

    cfg, params = model_and_params
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(9)
    bags = _bags(rng, 9)
    sc = ServeConfig(max_batch=8, max_wait_ms=20, bucket_sizes=BUCKETS)
    with DynamicBatcher(params, cfg, sc, mesh=mesh) as bm, DynamicBatcher(params, cfg, sc) as b1:
        fm = [bm.submit(f, s) for f, s in bags]
        f1 = [b1.submit(f, s) for f, s in bags]
        for a, b in zip(fm, f1):
            pa, pb = a.result(timeout=120), b.result(timeout=120)
            np.testing.assert_allclose(pa.y_prob, pb.y_prob, atol=1e-4)
            assert pa.y_hat == pb.y_hat
        assert bm.stats().batched_slides == 9


def test_mesh_parallel_int8_serving(model_and_params):
    """mesh x int8 together: quantized params replicate over the mesh and
    predictions match single-device int8 serving."""
    from toad_tpu.parallel.mesh import make_mesh

    cfg, params = model_and_params
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(11)
    bags = _bags(rng, 6)
    sc = ServeConfig(max_batch=8, max_wait_ms=20, bucket_sizes=BUCKETS, int8=True)
    with DynamicBatcher(params, cfg, sc, mesh=mesh) as bm, DynamicBatcher(params, cfg, sc) as b1:
        fm = [bm.submit(f, s) for f, s in bags]
        f1 = [b1.submit(f, s) for f, s in bags]
        for a, b in zip(fm, f1):
            pa, pb = a.result(timeout=120), b.result(timeout=120)
            np.testing.assert_allclose(pa.y_prob, pb.y_prob, atol=2e-3)
            assert pa.y_hat == pb.y_hat


def test_submit_quantized_matches_submit(model_and_params):
    """Pre-quantized submission (int8 bag store passthrough) is bitwise the
    same computation as handler-thread quantization of the same rows."""
    from toad_tpu.ops.quantize import quantize_rows_np

    cfg, params = model_and_params
    rng = np.random.default_rng(13)
    bags = _bags(rng, 4)
    sc = ServeConfig(max_batch=4, max_wait_ms=5, bucket_sizes=BUCKETS, int8=True)
    with DynamicBatcher(params, cfg, sc) as b:
        for feats, sex in bags:
            xq, sx = quantize_rows_np(np.asarray(feats, np.float32))
            pa = b.submit_quantized(xq, sx, sex).result(timeout=120)
            pb = b.submit(feats, sex).result(timeout=120)
            np.testing.assert_allclose(pa.y_prob, pb.y_prob, atol=1e-6)
            assert pa.y_hat == pb.y_hat
        with pytest.raises(ValueError, match="scales"):
            b.submit_quantized(np.zeros((8, cfg.in_dim), np.int8), np.ones(7, np.float32), 0)
        # a float bag passed by mistake must be rejected, not truncated to
        # garbage int8 and served as a confident wrong answer
        with pytest.raises(TypeError, match="int8"):
            b.submit_quantized(
                rng.standard_normal((8, cfg.in_dim)).astype(np.float32),
                np.ones(8, np.float32), 0,
            )
    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS)) as bf:
        with pytest.raises(ValueError, match="int8"):
            bf.submit_quantized(np.zeros((8, cfg.in_dim), np.int8), np.ones(8, np.float32), 0)


def test_mesh_rejects_indivisible_buckets(model_and_params):
    from toad_tpu.parallel.mesh import make_mesh

    cfg, params = model_and_params
    mesh = make_mesh(1, 8)  # bag axis 8; bucket withroom 36 not divisible
    with pytest.raises(ValueError, match="not divisible by bag axis"):
        DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=(36, 64)), mesh=mesh)


def test_http_heatmap_route(http_service, tmp_path):
    _, port, _ = http_service
    from toad_tpu.pipeline.featurize import write_bag

    feats = np.random.default_rng(11).standard_normal((24, DIM)).astype(np.float32)
    coords = (np.mgrid[0:6, 0:4].reshape(2, -1).T * 256).astype(np.int64)
    bag = tmp_path / "hm.npy"
    write_bag(bag, feats, coords)
    status, ctype, data = _post_raw(port, "/heatmap", {"bag_path": str(bag), "sex": "F"})
    assert status == 200 and ctype == "image/png", (status, ctype, data[:80])
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 100

    # a coords-less bag is a 400 with a useful message
    bare = tmp_path / "bare.npy"
    np.save(bare, feats)
    status, ctype, data = _post_raw(port, "/heatmap", {"bag_path": str(bare), "sex": "F"})
    assert status == 400 and b"coordinates" in data
    status, ctype, data = _post_raw(port, "/heatmap", {"sex": "F"})
    assert status == 400 and b"bag_path" in data

    # site-task heatmap + bad task name
    status, ctype, data = _post_raw(port, "/heatmap", {"bag_path": str(bag), "sex": "F", "task": "site"})
    assert status == 200 and data[:8] == b"\x89PNG\r\n\x1a\n"
    status, ctype, data = _post_raw(port, "/heatmap", {"bag_path": str(bag), "sex": "F", "task": "banana"})
    assert status == 400 and b"origin" in data


def test_heatmap_downscale_validation(http_service, tmp_path):
    _, port, _ = http_service
    from toad_tpu.pipeline.featurize import write_bag

    feats = np.zeros((8, DIM), np.float32)
    coords = np.arange(16, dtype=np.int64).reshape(8, 2) * 256
    bag = tmp_path / "d.npy"
    write_bag(bag, feats, coords)
    status, _, data = _post_raw(port, "/heatmap", {"bag_path": str(bag), "sex": 0, "downscale": 0})
    assert status == 400 and b">= 1" in data


def test_serve_cli_rss_watchdog_drains_and_exits_42(model_and_params, tmp_path, capsys):
    """``serve --max_rss_gb`` below the process' startup RSS: the watchdog
    drains the server and the CLI exits ``RESTART_EXIT_CODE`` (42) so a
    supervisor restarts a fresh process — the containment for this
    platform's leaky TPU relay client (CLAUDE.md). Driven through the real
    CLI ``main`` in-process (no subprocess JAX re-init)."""
    from toad_tpu.cli import serve as serve_cli
    from toad_tpu.models.torch_interop import export_torch_checkpoint

    cfg, params = model_and_params
    ckpt = tmp_path / "s_0_checkpoint.pt"
    export_torch_checkpoint(ckpt, params)
    with pytest.raises(SystemExit) as ei:
        serve_cli.main([
            "--ckpt", str(ckpt), "--port", "0",
            "--encoding_size", str(cfg.in_dim), "--n_classes", str(cfg.n_classes),
            # any real process RSS trips the watermark on its first poll
            "--max_rss_gb", "0.000001",
        ])
    assert ei.value.code == serve_cli.RESTART_EXIT_CODE
    out = capsys.readouterr().out
    assert "draining for supervisor restart" in out
    assert "drained" in out


def test_serve_cli_rejects_bad_shards():
    from toad_tpu.cli.serve import main

    with pytest.raises(SystemExit, match="data_shards"):
        main(["--ckpt", "/nonexistent", "--data_shards", "0"])
    # a ladder the bag-sharded Pallas path can't serve is rejected at
    # startup against the mesh's ACTUAL shard count (128*4=512), before
    # the checkpoint is even touched — not per-request
    with pytest.raises(SystemExit, match="512"):
        main(["--ckpt", "/nonexistent", "--bag_shards", "4", "--buckets", "384"])


def test_bf16_transfer_mode_close_to_f32(model_and_params):
    """bf16 feature transfer halves H2D bytes; predictions stay within bf16
    rounding of the f32-transfer path."""
    cfg, params = model_and_params
    rng = np.random.default_rng(21)
    bags = _bags(rng, 6)
    sc32 = ServeConfig(bucket_sizes=BUCKETS)
    scbf = ServeConfig(bucket_sizes=BUCKETS, transfer_dtype="bfloat16")
    with DynamicBatcher(params, cfg, sc32) as b32, DynamicBatcher(params, cfg, scbf) as bbf:
        for f, s in bags:
            p32 = b32.predict(f, s)
            pbf = bbf.predict(f, s)
            np.testing.assert_allclose(pbf.y_prob, p32.y_prob, atol=5e-3)
            assert pbf.site_hat == p32.site_hat


def test_transfer_dtype_auto_resolves_against_compute(model_and_params):
    """ServeConfig default 'auto': f32-compute model -> f32 wire (exact,
    bit-identical to an explicit float32 config); bf16-compute model -> bf16
    wire (numerically invisible: the features get cast to bf16 on device
    anyway, so host-side casting matches bit-for-bit)."""
    cfg, params = model_and_params
    rng = np.random.default_rng(33)
    bags = _bags(rng, 4)

    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS)) as ba, \
         DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS, transfer_dtype="float32")) as bf:
        assert ba.cfg.transfer_dtype == "float32"
        for f, s in bags:
            np.testing.assert_array_equal(ba.predict(f, s).y_prob, bf.predict(f, s).y_prob)

    bcfg = ModelConfig(in_dim=DIM, n_classes=6, compute_dtype="bfloat16")
    bparams = ToadMIL(bcfg).init(jax.random.PRNGKey(0))
    with DynamicBatcher(bparams, bcfg, ServeConfig(bucket_sizes=BUCKETS)) as ba, \
         DynamicBatcher(bparams, bcfg, ServeConfig(bucket_sizes=BUCKETS, transfer_dtype="float32")) as bf:
        assert ba.cfg.transfer_dtype == "bfloat16"
        for f, s in bags:
            np.testing.assert_array_equal(ba.predict(f, s).y_prob, bf.predict(f, s).y_prob)


def test_close_serves_queued_requests_instead_of_failing(model_and_params):
    """ADVICE r1: requests already enqueued when close() lands must be SERVED
    (graceful drain), not failed with 'batcher closed'. Hold the dispatch
    thread in a slow forward while more requests queue behind it."""
    import time as _t

    cfg, params = model_and_params
    b = DynamicBatcher(params, cfg, ServeConfig(max_batch=4, max_wait_ms=1, bucket_sizes=BUCKETS))
    b.predict(np.zeros((10, DIM), np.float32), 0)  # warm the compile cache

    orig = b._dispatch
    first_started = threading.Event()

    def slow_dispatch(bucket, want_attn, group):
        first_started.set()
        _t.sleep(0.4)  # requests pile up in the queue meanwhile
        return orig(bucket, want_attn, group)

    b._dispatch = slow_dispatch
    rng = np.random.default_rng(7)
    f_first = b.submit(rng.standard_normal((20, DIM)).astype(np.float32), 0)
    assert first_started.wait(timeout=10)
    queued = [b.submit(rng.standard_normal((20, DIM)).astype(np.float32), 1) for _ in range(5)]
    assert b.close(timeout=60) is True
    # every pre-close submission resolves to a real prediction
    for f in [f_first, *queued]:
        pred = f.result(timeout=10)
        assert pred.y_prob.shape[0] == cfg.n_classes


def test_warmup_precompiles_serving_shapes(model_and_params):
    """VERDICT r1 #7: after warmup, requests at configured shapes hit the
    jit cache — first-request latency is steady-state latency. Asserted
    structurally via the jit cache size (deterministic, unlike wall time)."""
    cfg, params = model_and_params
    single = SlideInference(params, cfg, bucket_sizes=BUCKETS)
    with DynamicBatcher(params, cfg, ServeConfig(max_batch=8, max_wait_ms=1, bucket_sizes=BUCKETS)) as b:
        n = b.warmup()
        assert n == len(BUCKETS) * 2  # batch 1 and batch max per bucket
        cache0 = b._fwd._cache_size()
        assert cache0 >= len(BUCKETS)
        rng = np.random.default_rng(11)
        for lo in (5, 40, 100):  # one request per bucket rung
            feats = rng.standard_normal((lo, DIM)).astype(np.float32)
            pred = b.predict(feats, 0)
            ref = single.predict(feats, 0)
            np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
        assert b._fwd._cache_size() == cache0, "request at a warmed shape recompiled"
        with pytest.raises(ValueError):
            b.warmup(buckets=(999,))


def test_params_committed_to_device_without_mesh(model_and_params):
    """ADVICE r1: host-numpy params would re-upload the whole tree every
    batch; the batcher must commit them to device once at construction."""
    cfg, params = model_and_params
    host_params = jax.tree.map(np.asarray, params)  # what restore_params returns
    with DynamicBatcher(host_params, cfg, ServeConfig(bucket_sizes=BUCKETS)) as b:
        leaves = jax.tree.leaves(b.params)
        assert all(isinstance(x, jax.Array) for x in leaves)


@pytest.fixture(scope="module")
def rooted_http_service(model_and_params, dummy_env):
    """Service with bag_root locked to the dummy bag dir."""
    cfg, params = model_and_params
    service = InferenceService(
        params, cfg, ServeConfig(max_batch=4, max_wait_ms=5, bucket_sizes=BUCKETS),
        task=dummy_env["task"], bag_root=dummy_env["data_dir"],
    )
    server, port = serve_in_thread(service)
    yield service, port, dummy_env
    server.shutdown()
    service.close()


def test_bag_root_confines_bag_paths(rooted_http_service):
    """ADVICE r1: bag_path must not be an arbitrary-file read/probe oracle."""
    service, port, env = rooted_http_service
    bag = next(iter(env["data_dir"].glob("*.npy")))

    # relative path inside the root works
    status, out = _post(port, "/predict", {"bag_path": bag.name, "sex": "F"})
    assert status == 200, out
    # absolute path inside the root works too
    status, out = _post(port, "/predict", {"bag_path": str(bag), "sex": "F"})
    assert status == 200, out

    # escapes are refused without echoing the path
    for evil in ("../../../etc/passwd", "/etc/passwd", f"{bag.name}/../../../../etc/passwd"):
        status, out = _post(port, "/predict", {"bag_path": evil, "sex": "F"})
        assert status == 403, (evil, out)
        assert "passwd" not in json.dumps(out)
    # missing file inside the root: 404 with no path echo
    status, out = _post(port, "/predict", {"bag_path": "nope.npy", "sex": "F"})
    assert status == 404 and "nope" not in json.dumps(out)


def test_nonloopback_bind_requires_bag_root(model_and_params, dummy_env):
    """A network-exposed server without --bag_root refuses bag_path outright
    (features_b64 requests still work)."""
    cfg, params = model_and_params
    service = InferenceService(
        params, cfg, ServeConfig(max_batch=4, max_wait_ms=5, bucket_sizes=BUCKETS)
    )
    try:
        server, port = serve_in_thread(service, host="0.0.0.0")
    except OSError:
        pytest.skip("cannot bind 0.0.0.0 in this sandbox")
    try:
        bag = next(iter(dummy_env["data_dir"].glob("*.npy")))
        status, out = _post(port, "/predict", {"bag_path": str(bag), "sex": "F"})
        assert status == 403 and "bag_root" in out["error"]
        feats = np.zeros((8, DIM), np.float32)
        status, out = _post(port, "/predict", {"features": feats.tolist(), "sex": "F"})
        assert status == 200, out
    finally:
        server.shutdown()
        service.close()


def test_batcher_temperature(model_and_params):
    """ServeConfig(temperature=T) scales served class probs exactly like
    apply_temperature on the raw probs; site probs and y_hat unchanged."""
    from toad_tpu.evaluate.calibration import apply_temperature

    cfg, params = model_and_params
    rng = np.random.default_rng(21)
    feats = rng.standard_normal((40, cfg.in_dim)).astype(np.float32)
    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS)) as b1:
        p1 = b1.submit(feats, 0).result(timeout=120)
    with DynamicBatcher(params, cfg, ServeConfig(bucket_sizes=BUCKETS, temperature=3.0)) as b3:
        p3 = b3.submit(feats, 0).result(timeout=120)
    np.testing.assert_allclose(p3.y_prob, apply_temperature(p1.y_prob[None], 3.0)[0], atol=1e-6)
    assert p3.y_hat == p1.y_hat
    np.testing.assert_allclose(p3.site_prob, p1.site_prob, atol=0)


def test_http_predict_features_int8_wire(model_and_params, dummy_env):
    """Client-side pre-quantized wire format: same answer as f32 features
    on the same int8 server (bitwise same computation), 4x fewer bytes;
    rejected with 400 on a non-int8 server and on malformed payloads."""
    from toad_tpu.ops.quantize import quantize_rows_np

    cfg, params = model_and_params
    task = dummy_env["task"]
    sc = ServeConfig(max_batch=8, max_wait_ms=5, bucket_sizes=BUCKETS, int8=True)
    service = InferenceService(params, cfg, sc, task=task)
    server, port = serve_in_thread(service)
    try:
        rng = np.random.default_rng(31)
        feats = rng.standard_normal((40, DIM)).astype(np.float32)
        xq, sx = quantize_rows_np(feats)
        body_q = {
            "features_int8_b64": base64.b64encode(xq.tobytes()).decode(),
            "scales_b64": base64.b64encode(sx.astype("<f4").tobytes()).decode(),
            "shape": [40, DIM],
            "sex": "F",
        }
        st_q, out_q = _post(port, "/predict", body_q)
        assert st_q == 200, out_q
        st_f, out_f = _post(port, "/predict", {"features": feats.tolist(), "sex": "F"})
        assert st_f == 200
        np.testing.assert_allclose(out_q["y_prob"], out_f["y_prob"], atol=1e-6)
        assert out_q["y_hat"] == out_f["y_hat"]

        # malformed: missing scales, wrong payload size
        st, out = _post(port, "/predict", {k: v for k, v in body_q.items() if k != "scales_b64"})
        assert st == 400 and "scales_b64" in out["error"]
        bad = dict(body_q, shape=[39, DIM])
        st, out = _post(port, "/predict", bad)
        assert st == 400 and "int8 values" in out["error"]
    finally:
        server.shutdown()
        service.close()

    # non-int8 server: clean 400, not a 500
    service_f = InferenceService(params, cfg, ServeConfig(bucket_sizes=BUCKETS), task=task)
    server_f, port_f = serve_in_thread(service_f)
    try:
        st, out = _post(port_f, "/predict", body_q)
        assert st == 400 and "int8" in out["error"]
    finally:
        server_f.shutdown()
        service_f.close()


def _post_octet(port, payload: bytes, headers: dict):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/predict", payload, {"Content-Type": "application/octet-stream", **headers})
    r = conn.getresponse()
    data = json.loads(r.read())
    conn.close()
    return r.status, data


def test_http_predict_raw_octet_stream(http_service):
    """Raw application/octet-stream /predict: byte-identical answer to the
    JSON+base64 path (same bytes reach the same batcher), with metadata in
    X-Toad-* headers; malformed headers/bodies get clean 400s."""
    service, port, task = http_service
    rng = np.random.default_rng(41)
    feats = rng.standard_normal((40, DIM)).astype(np.float32)
    raw = feats.astype("<f4").tobytes()

    st_b64, out_b64 = _post(
        port,
        "/predict",
        {
            "features_b64": base64.b64encode(raw).decode(),
            "shape": [40, DIM],
            "sex": "F",
            "top_k": 3,
            "attention": True,
        },
    )
    assert st_b64 == 200, out_b64
    st_raw, out_raw = _post_octet(
        port,
        raw,
        {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Sex": "F", "X-Toad-Top-K": "3", "X-Toad-Attention": "1"},
    )
    assert st_raw == 200, out_raw
    assert out_raw == out_b64  # byte-identical: same floats, same labels, same attention

    # default dtype f32, attention off by default
    st, out = _post_octet(port, raw, {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Sex": "M"})
    assert st == 200 and "attention" not in out

    # malformed: missing shape / bad shape / byte-count mismatch / bad dtype / bad sex
    st, out = _post_octet(port, raw, {"X-Toad-Sex": "F"})
    assert st == 400 and "X-Toad-Shape" in out["error"]
    st, out = _post_octet(port, raw, {"X-Toad-Shape": "forty", "X-Toad-Sex": "F"})
    assert st == 400 and "malformed" in out["error"]
    st, out = _post_octet(port, raw[:-4], {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Sex": "F"})
    assert st == 400 and "bytes" in out["error"]
    st, out = _post_octet(
        port, raw, {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Dtype": "float64", "X-Toad-Sex": "F"}
    )
    assert st == 400 and "X-Toad-Dtype" in out["error"]
    st, out = _post_octet(port, raw, {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Sex": "banana"})
    assert st == 400

    # octet-stream on /heatmap is rejected, not misparsed as JSON
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/heatmap", raw, {"Content-Type": "application/octet-stream"})
    r = conn.getresponse()
    assert r.status == 400 and b"octet-stream" in r.read()
    conn.close()


def test_http_predict_raw_int8(model_and_params, dummy_env):
    """Raw int8 wire format (rows + trailing f32 scales): identical answer
    to the features_int8_b64 path; clean 400 on a non-int8 server."""
    from toad_tpu.ops.quantize import quantize_rows_np

    cfg, params = model_and_params
    task = dummy_env["task"]
    sc = ServeConfig(max_batch=8, max_wait_ms=5, bucket_sizes=BUCKETS, int8=True)
    service = InferenceService(params, cfg, sc, task=task)
    server, port = serve_in_thread(service)
    try:
        rng = np.random.default_rng(43)
        feats = rng.standard_normal((40, DIM)).astype(np.float32)
        xq, sx = quantize_rows_np(feats)
        raw = xq.tobytes() + sx.astype("<f4").tobytes()
        hdrs = {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Dtype": "int8", "X-Toad-Sex": "F"}

        st_raw, out_raw = _post_octet(port, raw, hdrs)
        assert st_raw == 200, out_raw
        st_b64, out_b64 = _post(
            port,
            "/predict",
            {
                "features_int8_b64": base64.b64encode(xq.tobytes()).decode(),
                "scales_b64": base64.b64encode(sx.astype("<f4").tobytes()).decode(),
                "shape": [40, DIM],
                "sex": "F",
            },
        )
        assert st_b64 == 200
        assert out_raw == out_b64

        st, out = _post_octet(port, raw[:-1], hdrs)
        assert st == 400 and "bytes" in out["error"]
    finally:
        server.shutdown()
        service.close()

    # non-int8 server: clean 400, not a 500
    service_f = InferenceService(params, cfg, ServeConfig(bucket_sizes=BUCKETS), task=task)
    server_f, port_f = serve_in_thread(service_f)
    try:
        st, out = _post_octet(port_f, raw, hdrs)
        assert st == 400 and "int8" in out["error"]
    finally:
        server_f.shutdown()
        service_f.close()


def test_http_body_size_cap(model_and_params, dummy_env):
    """POST bodies beyond max_body_bytes get 413 without being read — both
    raw and JSON routes."""
    from toad_tpu.serve.server import make_http_server

    cfg, params = model_and_params
    service = InferenceService(
        params, cfg, ServeConfig(max_batch=4, max_wait_ms=5, bucket_sizes=BUCKETS), task=dummy_env["task"]
    )
    server = make_http_server(service, port=0, max_body_bytes=1024)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        big = b"\x00" * 2048
        st, out = _post_octet(port, big, {"X-Toad-Shape": f"8,{DIM}", "X-Toad-Sex": "F"})
        assert st == 413 and "cap" in out["error"]
        st, out = _post(port, "/predict", {"features": [[0.0] * DIM] * 4, "sex": "F"})
        assert st == 413  # the JSON body for 4x64 floats also exceeds 1024 bytes

        # under the cap still works
        feats = np.zeros((2, DIM), np.float32)
        st, out = _post_octet(
            port, feats.tobytes(), {"X-Toad-Shape": f"2,{DIM}", "X-Toad-Sex": "F"}
        )
        assert st == 200, out
    finally:
        server.shutdown()
        service.close()


def test_http_predict_raw_bf16_body(http_service):
    """bfloat16 raw bodies: half the f32 wire bytes; the decoded rows equal
    the client-side bf16 cast, so the answer matches posting the f32 rows
    pre-rounded to bf16 exactly, and tracks the full-f32 answer closely."""
    import ml_dtypes

    service, port, task = http_service
    rng = np.random.default_rng(77)
    feats = rng.standard_normal((40, DIM)).astype(np.float32)
    f_bf16 = feats.astype(ml_dtypes.bfloat16)
    hdr = {"X-Toad-Shape": f"40,{DIM}", "X-Toad-Sex": "F", "X-Toad-Top-K": "3"}

    st, out_bf = _post_octet(port, f_bf16.tobytes(), {**hdr, "X-Toad-Dtype": "bfloat16"})
    assert st == 200, out_bf
    # f32 body carrying the SAME bf16-rounded values -> byte-identical answer
    st, out_f32r = _post_octet(port, f_bf16.astype("<f4").tobytes(), hdr)
    assert st == 200 and out_bf == out_f32r
    # vs the unrounded f32 rows: same label, probs within bf16 rounding noise
    st, out_f32 = _post_octet(port, feats.astype("<f4").tobytes(), hdr)
    assert st == 200
    assert out_bf["y_hat"] == out_f32["y_hat"]
    np.testing.assert_allclose(
        [p for _, p in out_bf["topk"]], [p for _, p in out_f32["topk"]], atol=2e-2
    )

    # byte-count validation: bf16 needs n*dim*2
    st, out = _post_octet(port, f_bf16.tobytes()[:-2], {**hdr, "X-Toad-Dtype": "bf16"})
    assert st == 400 and "bf16 needs" in out["error"]


# -- mean-of-folds ensemble serving ------------------------------------------


@pytest.fixture(scope="module")
def ensemble_members(model_and_params):
    cfg, params = model_and_params
    return cfg, [params, ToadMIL(cfg).init(jax.random.PRNGKey(7))]


def test_ensemble_batcher_matches_ensemble_inference(ensemble_members):
    """Stacked-vmap ensemble serving reproduces EnsembleInference: per-member
    class softmax -> mean, and attention = mean of the members' softmaxed
    pooling weights (sums to 1 over the real rows)."""
    from toad_tpu.pipeline.infer import EnsembleInference

    cfg, members = ensemble_members
    ens = EnsembleInference(members, cfg, bucket_sizes=BUCKETS)
    rng = np.random.default_rng(3)
    bags = _bags(rng, 6)
    sc = ServeConfig(max_batch=8, max_wait_ms=20, bucket_sizes=BUCKETS, need_attention=True)
    with DynamicBatcher(members, cfg, sc) as b:
        assert b.n_members == 2
        futures = [b.submit(f, s) for f, s in bags]
        preds = [f.result(timeout=120) for f in futures]
    for (feats, sex), pred in zip(bags, preds):
        ref = ens.predict(feats, sex)
        np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
        np.testing.assert_allclose(pred.site_prob, ref.site_prob, atol=1e-5)
        np.testing.assert_allclose(pred.attention, ref.attention, atol=1e-5)
        np.testing.assert_allclose(pred.attention.sum(), 1.0, atol=1e-5)
        assert pred.y_hat == ref.y_hat and pred.site_hat == ref.site_hat


def test_ensemble_temperature_applied_per_member(ensemble_members):
    """T is applied per member BEFORE the mean (the mean of T-scaled softmaxes
    is not the T-scaled mean) — same rule as predict --ensemble."""
    from toad_tpu.pipeline.infer import EnsembleInference

    cfg, members = ensemble_members
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((40, DIM)).astype(np.float32)
    ref = EnsembleInference(members, cfg, bucket_sizes=BUCKETS, temperature=2.0).predict(feats, 1)
    with DynamicBatcher(members, cfg, ServeConfig(bucket_sizes=BUCKETS, temperature=2.0)) as b:
        pred = b.predict(feats, 1)
    np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
    assert pred.y_hat == ref.y_hat


def test_ensemble_int8_batcher(ensemble_members):
    """int8 ensemble: per-member quantized trunks stacked for the vmapped
    forward; probabilities track the f32 ensemble within quant noise."""
    cfg, members = ensemble_members
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((50, DIM)).astype(np.float32)
    with DynamicBatcher(members, cfg, ServeConfig(bucket_sizes=BUCKETS, int8=True)) as bq:
        assert bq.n_members == 2
        pq = bq.predict(feats, 0)
    with DynamicBatcher(members, cfg, ServeConfig(bucket_sizes=BUCKETS)) as bf:
        pf = bf.predict(feats, 0)
    np.testing.assert_allclose(pq.y_prob, pf.y_prob, atol=0.01)
    assert pq.y_hat == pf.y_hat


def test_ensemble_mesh_serving(ensemble_members):
    """ensemble x ('data','bag') mesh compose: the member axis vmaps over
    GSPMD-sharded batches and matches single-device ensemble serving."""
    from toad_tpu.parallel.mesh import make_mesh

    cfg, members = ensemble_members
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(6)
    bags = _bags(rng, 5)
    sc = ServeConfig(max_batch=8, max_wait_ms=20, bucket_sizes=BUCKETS)
    with DynamicBatcher(members, cfg, sc, mesh=mesh) as bm, DynamicBatcher(members, cfg, sc) as b1:
        fm = [bm.submit(f, s) for f, s in bags]
        f1 = [b1.submit(f, s) for f, s in bags]
        for a, b in zip(fm, f1):
            pa, pb = a.result(timeout=120), b.result(timeout=120)
            np.testing.assert_allclose(pa.y_prob, pb.y_prob, atol=1e-4)
            assert pa.y_hat == pb.y_hat


def test_ensemble_service_from_results_dir(tmp_path, ensemble_members):
    """from_checkpoint(ensemble=True) over a cli/train.py-layout results dir;
    /stats reports the member count and /predict serves the ensemble mean."""
    from toad_tpu.pipeline.infer import EnsembleInference
    from toad_tpu.train.checkpoint import save_checkpoint

    cfg, members = ensemble_members
    for i, p in enumerate(members):
        save_checkpoint(tmp_path / f"s_{i}_checkpoint", {"params": p, "epoch": np.int64(0)})
    service = InferenceService.from_checkpoint(
        tmp_path, cfg, ServeConfig(bucket_sizes=BUCKETS), ensemble=True
    )
    server, port = serve_in_thread(service)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["config"]["ensemble_members"] == 2
        rng = np.random.default_rng(8)
        feats = rng.standard_normal((30, DIM)).astype(np.float32)
        body = json.dumps({"features_b64": base64.b64encode(feats.astype("<f4").tobytes()).decode(),
                           "shape": [30, DIM], "sex": "F"})
        conn.request("POST", "/predict", body, {"Content-Type": "application/json"})
        out = json.loads(conn.getresponse().read())
        ref = EnsembleInference(members, cfg, bucket_sizes=BUCKETS).predict(feats, 0)
        np.testing.assert_allclose(out["y_prob"], ref.y_prob, atol=1e-5)
        assert out["y_hat"] == ref.y_hat
        conn.close()
    finally:
        server.shutdown()
        service.close()
    # and a dir with no members refuses loudly
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="s_<k>_checkpoint"):
        InferenceService.from_checkpoint(
            tmp_path / "empty", cfg, ServeConfig(bucket_sizes=BUCKETS), ensemble=True
        )


def test_single_member_ensemble_keeps_contract(ensemble_members):
    """A 1-fold results dir served with --ensemble must keep the documented
    ensemble semantics (attention = softmaxed pooling weights summing to 1,
    temperature applied per member on device), not silently degrade to the
    plain-serving raw-score contract."""
    from toad_tpu.pipeline.infer import EnsembleInference

    cfg, members = ensemble_members
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((40, DIM)).astype(np.float32)
    ref = EnsembleInference(
        members[:1], cfg, bucket_sizes=BUCKETS, temperature=2.0
    ).predict(feats, 1)
    sc = ServeConfig(bucket_sizes=BUCKETS, need_attention=True, temperature=2.0)
    with DynamicBatcher(members[:1], cfg, sc) as b:
        assert b.ensemble and b.n_members == 1
        pred = b.predict(feats, 1, attention=True)
    np.testing.assert_allclose(pred.y_prob, ref.y_prob, atol=1e-5)
    np.testing.assert_allclose(pred.attention, ref.attention, atol=1e-6)
    np.testing.assert_allclose(pred.attention.sum(), 1.0, atol=1e-5)
    # the plain (non-list) batcher still returns raw scores — back-compat
    with DynamicBatcher(members[0], cfg, sc) as b:
        assert not b.ensemble
        raw = b.predict(feats, 1, attention=True)
    assert abs(raw.attention.sum() - 1.0) > 1e-3


def test_ensemble_pallas_forward_lowers_for_tpu(ensemble_members):
    """Mosaic-lowering guard: the ensemble forward with the fused Pallas
    pooling kernel must lower for platform 'tpu'. vmap over the stacked
    member params does NOT lower (Mosaic rejects batched weight-operand
    blocks — probed on chip), which is why _combine unrolls the member loop;
    this guards that property in the CPU suite."""
    cfg, members = ensemble_members
    pcfg = ModelConfig(in_dim=DIM, n_classes=6, use_pallas=True)
    with DynamicBatcher(members, pcfg, ServeConfig(bucket_sizes=(128, 256))) as b:
        feats = np.zeros((2, 128, DIM), np.float32)  # Pallas needs 128-multiple buckets
        mask = np.ones((2, 128), np.float32)
        sex = np.zeros((2,), np.int32)
        for want_attn in (False, True):
            b._fwd.trace(b.params, feats, mask, sex, need_attention=want_attn).lower(
                lowering_platforms=("tpu",)
            )  # raises on Mosaic rejection
