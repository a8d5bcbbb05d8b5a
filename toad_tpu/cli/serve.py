"""``python -m toad_tpu.cli.serve`` — online prediction server.

Loads a trained checkpoint (Orbax directory or reference torch
``s_{fold}_checkpoint.pt``) and serves ``POST /predict`` with dynamic
batching (:mod:`toad_tpu.serve`). The reference has no serving entry point;
its closest analog is the offline ``eval_mtl_concat.py``, which requires
ground-truth labels.
"""

from __future__ import annotations

import argparse

# exit code signalling "restart me" to a supervisor after an RSS-watermark
# drain (distinct from 0 = clean stop and 1 = error)
RESTART_EXIT_CODE = 42


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True, help="Orbax dir or torch s_k_checkpoint.pt")
    p.add_argument("--task", type=str, default=None, help="task JSON (for label names in responses)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--encoding_size", type=int, default=1024)
    p.add_argument("--n_classes", type=int, default=None, help="defaults to the task's class count (or 18)")
    p.add_argument("--max_batch", type=int, default=32, help="dynamic-batch size cap")
    p.add_argument("--max_wait_ms", type=float, default=5.0, help="batching window after first request")
    p.add_argument("--attention", action="store_true", help="compute attention scores on every request")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--bf16_transfer", action="store_true",
        help="force bfloat16 host->device feature transfer even under f32 compute "
        "(halves H2D bytes, the serving bottleneck; on automatically with --bf16)",
    )
    p.add_argument("--pallas", action="store_true", help="fused Pallas pooling kernel")
    p.add_argument(
        "--int8", action="store_true",
        help="quantized inference: bags quantized per-row in the handler thread, "
        "int8 H2D transfer (4x fewer bytes than f32) and int8 MXU pooling GEMMs "
        "(measured 1.45x the bf16 kernel); heads stay f32",
    )
    p.add_argument(
        "--temperature", type=float, default=1.0,
        help="calibrated softmax temperature for class probabilities "
        "(fit with evaluate --calibrate; for --ensemble it is applied per "
        "member before the mean, matching predict --ensemble)",
    )
    from toad_tpu.cli.common import add_temperature_from_arg

    add_temperature_from_arg(p)
    p.add_argument(
        "--ensemble", action="store_true",
        help="serve the mean-of-folds CV ensemble: --ckpt is a training "
        "results dir and every s_<k>_checkpoint becomes a member; all members "
        "run inside ONE jitted forward, so a request batch still costs one "
        "dispatch (K x the FLOPs, zero extra compiles). Attention responses "
        "carry the mean of the members' softmaxed pooling weights instead of "
        "raw scores",
    )
    from toad_tpu.cli.common import add_buckets_arg
    add_buckets_arg(p)
    p.add_argument(
        "--data_shards", type=int, default=None,
        help="mesh data axis (data-parallel serving); the other axis is inferred when omitted",
    )
    p.add_argument(
        "--bag_shards", type=int, default=None,
        help="mesh bag axis (patch-dim sharding); the other axis is inferred when omitted",
    )
    p.add_argument(
        "--compile_cache", type=str, default=None, metavar="DIR",
        help="persistent XLA compilation cache: restarts skip first-touch compiles",
    )
    p.add_argument(
        "--bag_root", type=str, default=None, metavar="DIR",
        help="restrict request bag_path to this directory (required for bag_path "
        "when binding beyond loopback); relative bag_paths resolve against it",
    )
    p.add_argument(
        "--max_body_mb", type=int, default=1024, metavar="MB",
        help="reject POST bodies beyond this size with 413 (default 1024 MB — "
        "fits a 163840x1024 f32 patient bag on the raw octet-stream route)",
    )
    p.add_argument(
        "--max_rss_gb", type=float, default=None, metavar="GB",
        help="leaky-runtime containment: when host RSS crosses GB, drain "
        f"gracefully and exit {RESTART_EXIT_CODE} so a supervisor restarts the "
        "server (this platform's TPU relay client permanently leaks every "
        "transferred request byte host-side)",
    )
    p.add_argument(
        "--warmup", type=str, default=None, nargs="?", const="all", metavar="BUCKETS",
        help="pre-compile serving shapes before accepting traffic: 'all' (every "
        "bucket) or comma-separated bucket sizes, each at batch 1 and max_batch; "
        "composes with --compile_cache (warm once, restart instantly)",
    )
    return p


def main(argv=None) -> None:
    args = make_parser().parse_args(argv)

    from toad_tpu.config import ModelConfig
    from toad_tpu.registry import load_task
    from toad_tpu.serve import InferenceService, ServeConfig, make_http_server

    if args.compile_cache:
        from toad_tpu.cli.common import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    task = load_task(args.task) if args.task else None
    n_classes = args.n_classes or (task.n_classes[0] if task else 18)
    model_cfg = ModelConfig(
        in_dim=args.encoding_size,
        n_classes=n_classes,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.pallas,
    )
    mesh = None
    if args.data_shards is not None or args.bag_shards is not None:
        for name, v in (("data_shards", args.data_shards), ("bag_shards", args.bag_shards)):
            if v is not None and v < 1:
                raise SystemExit(f"--{name} must be >= 1, got {v}")
        from toad_tpu.parallel.mesh import make_mesh

        # mesh_shape_for infers the other axis when only one flag is given
        mesh = make_mesh(args.data_shards, args.bag_shards)
        if mesh.devices.size == 1:
            mesh = None  # single device: the mesh adds nothing
    from toad_tpu.cli.common import resolve_buckets, resolve_temperature

    # validate the ladder against the ACTUAL bag-shard count (mesh may have
    # inferred it), so a bad ladder is rejected at startup, not per-request
    buckets = resolve_buckets(args.buckets, bag_shards=dict(mesh.shape).get("bag", 1) if mesh else 1)
    serve_cfg = ServeConfig(
        **({"bucket_sizes": buckets} if buckets else {}),
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        need_attention=args.attention,
        # 'auto': bf16 wire iff --bf16 compute (numerically invisible there)
        transfer_dtype="bfloat16" if args.bf16_transfer else "auto",
        int8=args.int8,
        temperature=resolve_temperature(args.temperature, args.temperature_from),
    )
    service = InferenceService.from_checkpoint(
        args.ckpt, model_cfg, serve_cfg, task=task, mesh=mesh, bag_root=args.bag_root,
        ensemble=args.ensemble,
    )
    if args.ensemble:
        print(f"ensemble: {service.batcher.n_members} fold checkpoints from {args.ckpt}")
    if args.warmup is not None:
        import time

        buckets = None if args.warmup == "all" else tuple(int(v) for v in args.warmup.split(","))
        t0 = time.perf_counter()
        n = service.batcher.warmup(buckets)
        print(f"warmup: {n} shape variants compiled in {time.perf_counter() - t0:.1f}s")
    server = make_http_server(service, args.host, args.port, max_body_bytes=args.max_body_mb << 20)
    mesh_note = f"; mesh {dict(mesh.shape)}" if mesh is not None else ""
    print(
        f"serving on http://{args.host}:{server.server_address[1]}  "
        f"(POST /predict, POST /heatmap, GET /stats){mesh_note}"
    )

    # graceful stop on SIGTERM/SIGINT: shutdown() must run off the serving
    # thread (it blocks until serve_forever exits), so hand it to a thread
    import signal
    import threading

    def _stop(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    rss_tripped = threading.Event()
    if args.max_rss_gb is not None:
        # leaky-runtime containment: this platform's TPU relay client leaks
        # every transferred request byte host-side, so a long-lived server's
        # RSS only grows. When it crosses the watermark, drain gracefully and
        # exit RESTART_EXIT_CODE so a supervisor (systemd Restart=on-failure,
        # k8s restartPolicy) brings up a fresh process — the standard pattern
        # for unreclaimable runtime leaks.
        from toad_tpu.utils.profiling import host_rss_gb

        def _rss_watchdog():
            import time as _t

            while not rss_tripped.is_set():
                rss = host_rss_gb()
                if rss >= args.max_rss_gb:
                    print(
                        f"host RSS {rss:.1f} GiB >= --max_rss_gb {args.max_rss_gb:.1f}: "
                        f"draining for supervisor restart (exit {RESTART_EXIT_CODE})",
                        flush=True,
                    )
                    rss_tripped.set()
                    threading.Thread(target=server.shutdown, daemon=True).start()
                    return
                _t.sleep(5.0)

        threading.Thread(target=_rss_watchdog, daemon=True, name="toad-rss-watchdog").start()
    try:
        server.serve_forever()
    finally:
        server.server_close()
        drained = service.close()
        # the batcher drain resolved the futures; now let the daemon handler
        # threads finish writing those responses before the process exits
        handlers_done = server.drain_requests(30.0)
        if drained and handlers_done:
            print("server stopped; in-flight requests drained")
        elif drained:
            print("server stopped; in-flight requests drained (WARNING: a handler was still writing its response at exit)")
        else:
            print("server stopped; WARNING: dispatch thread still busy after timeout")
        if rss_tripped.is_set():
            raise SystemExit(RESTART_EXIT_CODE)


if __name__ == "__main__":
    main()
