"""Device-parallel k-fold cross-validation: one fold per local TPU chip.

The reference trains its k=10 CV folds strictly sequentially — one full
``train()`` per fold inside the CLI loop (``main_mtl_concat.py:46-63``), so a
10-fold experiment costs 10x one fold's wall-clock even on a 16-GPU box (its
``nn.DataParallel`` splits a single bag's rows, not folds —
``models/model_toad.py:79-81``). Folds are embarrassingly parallel: each owns
its params (~1M), its split, and its RNG stream, and shares nothing.

The TPU-native driver exploits that with *placement*, not new math: fold i's
entire training state (params, optimizer state, RNG key) and every batch are
committed to local device ``i mod n``, and one worker thread per device drives
the unchanged :class:`~toad_tpu.train.loop.FoldTrainer`. JAX dispatch is async
and thread-safe, so n chips stay busy from a single Python process; host-side
work per step (metric tallies, batch packing) is a few percent of step time
and interleaves on the host core while the chips compute.

Because nothing about the per-fold computation changes — same
``PRNGKey(seed)`` per fold, same bucketed batch order (the batcher's RNG is
private, seeded ``seed + fold*1009``), same donated jitted step — each fold's
results are bit-identical to a sequential ``--fold_devices 1`` run on the same
hardware (asserted by ``tests/test_parallel_folds.py`` on the 8-device CPU
mesh). Wall-clock for the whole experiment approaches ``ceil(k/n) x
max(fold_time)`` instead of ``sum(fold_times)``.

Mutually exclusive with intra-fold mesh sharding (``--data_shards`` /
``--bag_shards``): one fold per chip already saturates the mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Sequence

import jax

from toad_tpu.config import TrainConfig
from toad_tpu.train.loop import FoldTrainer


def resolve_fold_devices(n_requested: int) -> list:
    """The first ``n_requested`` local devices (all of them for ``-1``)."""
    devs = jax.local_devices()
    if n_requested == -1:
        return devs
    if n_requested < 1:
        raise ValueError(f"fold_devices must be >= 1 or -1 (all), got {n_requested}")
    if n_requested > len(devs):
        raise ValueError(
            f"fold_devices={n_requested} but only {len(devs)} local devices are visible"
        )
    return devs[:n_requested]


def map_folds_over_devices(
    jobs: Iterable[tuple[int, Any]],
    fn: Callable[[int, Any, Any, Callable[[str], None]], Any],
    n_devices: int = -1,
    log_fn: Callable[[str], None] = print,
    on_result: Callable[[int, Any], None] | None = None,
    what: str = "fold",
    stream_logs: bool = False,
) -> dict[int, Any]:
    """Run ``fn(fold, payload, device, log)`` for every ``(fold, payload)``
    job, fanned out over local devices — the generic engine behind
    fold-parallel training AND evaluation.

    One pinned worker thread per device drives a shared work queue (a device
    never runs two folds at once; free devices pick up the next fold with no
    round barrier). ``log`` passed to ``fn`` buffers that fold's lines and
    flushes them atomically through ``log_fn`` when the fold finishes, so
    concurrent folds' output never interleaves (``stream_logs=True`` instead
    emits lines live under the lock — right for long training runs, whose
    per-epoch lines are the progress display). ``on_result(fold, result)``
    fires under the same lock the moment each fold completes — even if a
    later fold errors — so callers can persist per-fold artifacts
    incrementally. The first error is re-raised (as ``RuntimeError`` naming
    the fold) after all workers drain.
    """
    devices = resolve_fold_devices(n_devices)
    job_q: queue.Queue = queue.Queue()
    n_jobs = 0
    for job in jobs:
        job_q.put(job)
        n_jobs += 1
    results: dict[int, Any] = {}
    errors: list[tuple[int, BaseException]] = []
    lock = threading.Lock()

    def locked_log(msg: str) -> None:
        with lock:
            log_fn(msg)

    def worker(dev) -> None:
        while True:
            try:
                fold, payload = job_q.get_nowait()
            except queue.Empty:
                return
            lines: list[str] = []
            log = locked_log if stream_logs else lines.append
            try:
                r = fn(fold, payload, dev, log)
                with lock:
                    for line in lines:
                        log_fn(line)
                    results[fold] = r
                    if on_result is not None:
                        on_result(fold, r)
            except BaseException as e:  # noqa: BLE001 — re-raised after join
                with lock:
                    for line in lines:
                        log_fn(line)
                    errors.append((fold, e))
                return

    threads = [
        threading.Thread(target=worker, args=(d,), name=f"{what}-worker-{i}", daemon=True)
        for i, d in enumerate(devices[: max(1, min(len(devices), n_jobs))])
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    if errors:
        fold, err = errors[0]
        raise RuntimeError(f"{what} {fold} failed under fold-parallel execution") from err
    missing = n_jobs - len(results)
    if missing:
        # a worker died without recording an error (should be unreachable)
        raise RuntimeError(f"{missing} {what}s did not complete")
    return results


def train_folds_parallel(
    cfg: TrainConfig,
    jobs: Iterable[tuple[int, Sequence]],
    results_dir,
    n_devices: int = -1,
    log_fn: Callable[[str], None] = print,
    make_fold_writer: Callable[[int], Any] | None = None,
    on_result: Callable[[int, dict], None] | None = None,
) -> dict[int, dict]:
    """Train every ``(fold, (train, val, test))`` job, folds fanned out over
    local devices. Returns ``{fold: FoldTrainer.train() result}``.

    Scheduling is a work queue with one pinned worker thread per device:
    devices never run two folds at once, and when there are more folds than
    devices each worker picks up the next fold as soon as its current one
    finishes (no barrier between "rounds", unlike a static fold->device map,
    which would idle chips behind the slowest early-stopping fold).

    ``on_result(fold, result)`` fires (serialized under a lock) the moment a
    fold finishes — even if another fold later errors out. The CLI uses it to
    persist per-fold artifacts incrementally so a preemption mid-experiment
    loses only the in-flight folds (matching sequential-mode behavior), not
    every completed-but-unsummarized one.
    """
    if cfg.data_shards * cfg.bag_shards > 1:
        raise ValueError(
            "fold-parallel training cannot combine with data_shards/bag_shards "
            "(one fold per chip already owns the mesh)"
        )
    if cfg.profile_dir:
        raise ValueError("--profile supports one trace at a time; run it with fold_devices=1")

    def train_one(fold: int, splits: Sequence, dev, log: Callable[[str], None]) -> dict:
        writer = make_fold_writer(fold) if make_fold_writer is not None else None
        trainer = FoldTrainer(cfg, fold=fold, results_dir=results_dir, writer=writer, device=dev)
        log(f"[fold {fold}] -> {dev}")
        r = trainer.train(*splits, log_fn=log)
        if writer is not None:
            writer.close()
        return r

    # stream_logs: per-epoch lines ARE the progress display on long runs
    return map_folds_over_devices(
        jobs, train_one, n_devices=n_devices, log_fn=log_fn,
        on_result=on_result, stream_logs=True,
    )
