"""Task registry: tasks are data files, not code.

The reference registers tasks as ``elif`` branches duplicated across three
CLIs (``main_mtl_concat.py:140-159``, ``eval_mtl_concat.py:72-90``,
``create_splits.py:22-41``) — which drifted apart (three different spellings
of the same class). Here a task is a single JSON file under
``toad_tpu/tasks/`` or any user-supplied path, loaded once and validated
against the CSV vocabulary at dataset construction.
"""

from __future__ import annotations

import os
from pathlib import Path

from toad_tpu.config import TaskConfig

_BUILTIN_DIR = Path(__file__).parent / "tasks"


def task_search_dirs() -> list[Path]:
    dirs = [Path.cwd() / "tasks", _BUILTIN_DIR]
    extra = os.environ.get("TOAD_TPU_TASK_DIR")
    if extra:
        dirs.insert(0, Path(extra))
    return dirs


def list_tasks() -> list[str]:
    names: list[str] = []
    for d in task_search_dirs():
        if d.is_dir():
            names.extend(p.stem for p in sorted(d.glob("*.json")))
    # de-dup, first hit wins
    seen: set[str] = set()
    return [n for n in names if not (n in seen or seen.add(n))]


def load_task(name_or_path: str) -> TaskConfig:
    """Load a task by registry name or by explicit path to a JSON file."""
    p = Path(name_or_path)
    if p.suffix == ".json" and p.exists():
        return TaskConfig.from_json(p.read_text())
    # a registry name, possibly written with its .json suffix
    stem = name_or_path.removesuffix(".json")
    for d in task_search_dirs():
        candidate = d / f"{stem}.json"
        if candidate.exists():
            return TaskConfig.from_json(candidate.read_text())
    raise KeyError(
        f"unknown task {name_or_path!r}; available: {list_tasks()} "
        f"(searched {[str(d) for d in task_search_dirs()]})"
    )
