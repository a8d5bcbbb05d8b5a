"""Serving load test: drive the DynamicBatcher at a given concurrency and
report throughput + latency percentiles + coalescing stats.

Bypasses HTTP (the 1-core host's socket stack would dominate) to measure the
serving core itself: request coalescing, padded batched forwards, result
fan-out. Use it to pick `max_batch`/`max_wait_ms` for a deployment.

NOTE on this dev environment: request payloads are host-resident (as in real
serving), so the measured throughput includes H2D transfer — which the relay
in front of this TPU throttles erratically (CLAUDE.md). Numbers here
characterize the relay, not the serving core; run on a real TPU VM for
deployment tuning. (Measured here: coalescing works — mean batch 13 at
concurrency 16 — but H2D caps slides/s far below the device's 5.5k/s.)

Run: python experiments/serve_load.py [--concurrency 32 --requests 512
     --bag_n 8192 --max_batch 32 --max_wait_ms 5 --bf16 --pallas]
Prints one JSON line.

``--wire {none,json,raw}`` additionally routes every request through the real
HTTP server (loopback): ``json`` posts the features_b64 JSON document, ``raw``
posts application/octet-stream bytes (X-Toad-* headers). The report then
includes ``host_cpu_s`` (process CPU time over the run) and
``host_cpu_ms_per_req`` — the direct before/after for the wire-format tax
(base64+JSON encode/parse vs two frombuffer views) on the 1-core host.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--bag_n", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--bf16_transfer", action="store_true")
    ap.add_argument("--wire", choices=("none", "json", "raw"), default="none",
                    help="route requests through the real HTTP server: json=features_b64 "
                    "document, raw=application/octet-stream; none=direct batcher calls")
    args = ap.parse_args()

    import jax

    from toad_tpu.config import DEFAULT_BUCKETS, ModelConfig
    from toad_tpu.models.toad_mil import ToadMIL
    from toad_tpu.serve import DynamicBatcher, ServeConfig

    cfg = ModelConfig(
        in_dim=args.dim,
        n_classes=18,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.pallas,
    )
    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # a handful of distinct bags (reused round-robin: request payloads differ
    # per thread but device work is representative)
    bags = [rng.standard_normal((args.bag_n, args.dim)).astype(np.float32) for _ in range(4)]

    lat: list[float] = []
    lat_lock = threading.Lock()
    serve_cfg = ServeConfig(max_batch=args.max_batch, max_wait_ms=args.max_wait_ms, bucket_sizes=DEFAULT_BUCKETS, transfer_dtype="bfloat16" if args.bf16_transfer else "float32")

    if args.wire == "none":
        batcher = DynamicBatcher(params, cfg, serve_cfg)
        predict = lambda bag, sex: batcher.predict(bag, sex)  # noqa: E731
        close = batcher.close
        stats_fn = batcher.stats
    else:
        import base64
        import http.client
        import json as _json

        from toad_tpu.serve import InferenceService, serve_in_thread

        service = InferenceService(params, cfg, serve_cfg)
        server, port = serve_in_thread(service)

        if args.wire == "json":
            def http_request(bag, sex):
                body = _json.dumps({
                    "features_b64": base64.b64encode(bag.astype("<f4").tobytes()).decode(),
                    "shape": [int(bag.shape[0]), int(bag.shape[1])],
                    "sex": sex,
                }).encode()
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
                conn.request("POST", "/predict", body, {"Content-Type": "application/json"})
                r = conn.getresponse()
                out = r.read()
                conn.close()
                assert r.status == 200, out[:200]
        else:  # raw octet-stream
            def http_request(bag, sex):
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
                conn.request("POST", "/predict", bag.astype("<f4").tobytes(), {
                    "Content-Type": "application/octet-stream",
                    "X-Toad-Shape": f"{bag.shape[0]},{bag.shape[1]}",
                    "X-Toad-Sex": str(sex),
                })
                r = conn.getresponse()
                out = r.read()
                conn.close()
                assert r.status == 200, out[:200]

        predict = http_request

        def close():
            server.shutdown()
            service.close()

        stats_fn = service.batcher.stats

    try:
        predict(bags[0], 0)  # warm the compile cache for the bucket

        per_thread = args.requests // args.concurrency

        def client(tid: int):
            for i in range(per_thread):
                t0 = time.perf_counter()
                predict(bags[(tid + i) % len(bags)], (tid + i) % 2)
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client, args=(t,)) for t in range(args.concurrency)]
        cpu0 = time.process_time()
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        host_cpu = time.process_time() - cpu0
        stats = stats_fn()
    finally:
        close()

    lat_ms = np.asarray(lat) * 1e3
    print(
        json.dumps(
            {
                "requests": len(lat),
                "concurrency": args.concurrency,
                "slides_per_sec": round(len(lat) / wall, 1),
                "latency_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
                "latency_p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
                "latency_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
                "mean_batch_size": round(stats.mean_batch_size, 2),
                "batches": stats.batches,
                "padded_slot_frac": round(stats.padded_slots / max(stats.batched_slides + stats.padded_slots, 1), 3),
                "max_batch": args.max_batch,
                "max_wait_ms": args.max_wait_ms,
                "bag_n": args.bag_n,
                "transfer": "bf16" if args.bf16_transfer else "f32",
                "wire": args.wire,
                "host_cpu_s": round(host_cpu, 2),
                "host_cpu_ms_per_req": round(host_cpu / max(len(lat), 1) * 1e3, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
