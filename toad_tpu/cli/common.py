"""Shared CLI plumbing: task loading, dataset construction, settings echo."""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from toad_tpu.config import TaskConfig
from toad_tpu.data.wsi_dataset import WSIBagDataset
from toad_tpu.registry import list_tasks, load_task
from toad_tpu.utils.io import write_settings


def add_task_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--task",
        type=str,
        required=True,
        help=f"task name from the registry or path to a task JSON (available: {list_tasks()})",
    )
    p.add_argument("--csv_path", type=str, default=None, help="override the task's csv path")


def require_data_root(args) -> None:
    """Fail fast when a bag-reading command launches without --data_root_dir.

    Without this the omission only surfaces at the first bag access — a
    ValueError raised inside a prefetch worker after the settings banner and
    model init already printed (wsi_dataset._dir_for).
    """
    d = getattr(args, "data_root_dir", None)
    if d is None:
        raise SystemExit("error: --data_root_dir is required (directory containing feature bags)")
    if not Path(d).is_dir():
        raise SystemExit(f"error: --data_root_dir {d!r} is not a directory")


def build_dataset(args, data_dir=None, print_info: bool = True) -> tuple[TaskConfig, WSIBagDataset]:
    task = load_task(args.task)
    ds = WSIBagDataset(
        task,
        csv_path=args.csv_path,
        data_dir=data_dir,
        seed=getattr(args, "seed", 7),
        print_info=print_info,
    )
    return task, ds


def echo_settings(path: str | os.PathLike, settings: dict) -> None:
    write_settings(path, settings)
    print("################# Settings ###################")
    for k, v in settings.items():
        print(f"{k}:  {v}")


def add_buckets_arg(p: argparse.ArgumentParser, auto: bool = False) -> None:
    extra = ", or 'auto' to derive quantile rungs from the dataset's real patch counts (metadata reads only)" if auto else ""
    p.add_argument(
        "--buckets", type=str, default=None, metavar="LIST" + ("|auto" if auto else ""),
        help="bucket ladder override: comma-separated bag lengths (multiples of "
        f"128; `toad_tpu validate` suggests a data-derived ladder){extra}",
    )


def resolve_buckets(
    value: str | None,
    dataset=None,
    *,
    bag_shards: int = 1,
    patient_bags: bool = False,
) -> tuple[int, ...] | None:
    """--buckets: None (keep defaults), explicit comma list (sorted +
    validated), or 'auto' — a data-derived quantile ladder over the whole
    dataset so every fold/split shares one compile set. Rungs must be
    multiples of 128 * bag_shards: each shard's local patch-dim slice must
    itself satisfy the Pallas 128-row tile constraint."""
    if not value:
        return None
    # Each shard's LOCAL slice must satisfy the Pallas 128-row tile
    # (ops/pallas_pool.py::_tile_n on the shard_map slice), so the bucket
    # itself must be a multiple of 128 * bag_shards — NOT lcm(128, shards),
    # which for power-of-two shard counts is just 128 and would pass ladders
    # that die mid-training after the compile.
    multiple = 128 * max(int(bag_shards), 1)
    if value.strip().lower() == "auto":
        if dataset is None:
            raise SystemExit("--buckets auto needs a dataset (use an explicit list here)")
        from toad_tpu.data.batching import auto_bucket_ladder

        split = dataset.subset(range(dataset.n_slides))
        if patient_bags:
            from toad_tpu.data.wsi_dataset import PatientBagSplit

            split = PatientBagSplit(split)
        ladder = auto_bucket_ladder(split, multiple_of=multiple)
        print(f"auto bucket ladder ({len(split)} bags): {list(ladder)}")
        return ladder
    ladder = tuple(int(x) for x in value.split(","))
    bad = [b for b in ladder if b <= 0 or b % multiple]
    if bad:
        raise SystemExit(f"--buckets {bad} must be positive multiples of {multiple} "
                         f"(Pallas tile 128 x bag_shards {bag_shards})")
    return tuple(sorted(ladder))


def parse_sex(value) -> int:
    """F/M/0/1 (any case, also 'female'/'male', int- or float-coded like the
    '0.0' pandas produces for numeric columns with NaNs) -> 0/1."""
    m = {"f": 0, "m": 1, "female": 0, "male": 1, "0": 0, "1": 1, "0.0": 0, "1.0": 1}
    key = str(value).strip().lower()
    if key not in m:
        raise ValueError(f"sex must be F/M/0/1, got {value!r}")
    return m[key]


def enable_compile_cache(path: str | os.PathLike, min_compile_secs: float = 1.0) -> None:
    """Persistent XLA compilation cache: compiled programs survive process
    restarts, so a redeployed server or resumed training job skips the
    20s-to-minutes first-touch compiles (the dominant cold-start cost on a
    contended chip). Safe to share between processes; keyed by program
    fingerprint."""
    import jax

    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def add_temperature_from_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--temperature_from", type=str, default=None, metavar="JSON",
        help="read the serving temperature from a calibration JSON written by "
             "evaluate --calibrate (fold_<k>_calibration.json, or "
             "ensemble_calibration.json for --ensemble); conflicts with an "
             "explicit --temperature",
    )


def resolve_temperature(temperature: float, temperature_from: str | os.PathLike | None) -> float:
    """The serving temperature: explicit --temperature, or the 'temperature'
    key of an evaluate --calibrate artifact via --temperature_from."""
    if temperature_from is None:
        return temperature
    if temperature != 1.0:
        raise SystemExit("give --temperature OR --temperature_from, not both")
    import json

    path = os.fspath(temperature_from)
    try:
        obj = json.loads(Path(path).read_text())
    except FileNotFoundError:
        raise SystemExit(f"--temperature_from: {path} does not exist")
    except json.JSONDecodeError as e:
        raise SystemExit(f"--temperature_from: {path} is not valid JSON ({e})")
    if "temperature" not in obj:
        raise SystemExit(f"--temperature_from: no 'temperature' key in {path} (keys: {sorted(obj)})")
    t = float(obj["temperature"])
    print(f"temperature {t:.4f} from {path}")
    return t
