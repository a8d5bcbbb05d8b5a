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

    devices = resolve_fold_devices(n_devices)
    job_q: queue.Queue = queue.Queue()
    n_jobs = 0
    for job in jobs:
        job_q.put(job)
        n_jobs += 1
    results: dict[int, dict] = {}
    errors: list[tuple[int, BaseException]] = []
    lock = threading.Lock()

    def locked_log(msg: str) -> None:
        with lock:
            log_fn(msg)

    def worker(dev) -> None:
        while True:
            try:
                fold, splits = job_q.get_nowait()
            except queue.Empty:
                return
            try:
                writer = make_fold_writer(fold) if make_fold_writer is not None else None
                trainer = FoldTrainer(cfg, fold=fold, results_dir=results_dir, writer=writer, device=dev)
                locked_log(f"[fold {fold}] -> {dev}")
                r = trainer.train(*splits, log_fn=locked_log)
                if writer is not None:
                    writer.close()
                with lock:
                    results[fold] = r
                    if on_result is not None:
                        on_result(fold, r)
            except BaseException as e:  # noqa: BLE001 — re-raised after join
                with lock:
                    errors.append((fold, e))
                return

    threads = [
        threading.Thread(target=worker, args=(d,), name=f"fold-worker-{i}", daemon=True)
        for i, d in enumerate(devices[: max(1, min(len(devices), n_jobs))])
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    if errors:
        fold, err = errors[0]
        raise RuntimeError(f"fold {fold} failed under fold-parallel training") from err
    missing = n_jobs - len(results)
    if missing:
        # a worker died without recording an error (should be unreachable)
        raise RuntimeError(f"{missing} folds did not complete")
    return results
