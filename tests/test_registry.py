"""Task registry: data-file tasks, search order, and loud failure modes."""

import numpy as np
import pytest

from toad_tpu.config import TaskConfig
from toad_tpu.registry import list_tasks, load_task, task_search_dirs


def test_builtin_task_loads():
    task = load_task("dummy_mtl_concat")
    assert task.name == "dummy_mtl_concat"
    assert task.n_classes[0] == 18
    assert task.label_cols == ("label", "site", "sex")


def test_unknown_task_lists_available_and_dirs():
    with pytest.raises(KeyError) as e:
        load_task("nope")
    msg = str(e.value)
    assert "dummy_mtl_concat" in msg  # available tasks listed
    assert "searched" in msg  # search dirs listed


def test_load_by_explicit_path(tmp_path):
    task = load_task("dummy_mtl_concat")
    p = tmp_path / "custom.json"
    p.write_text(task.to_json())
    loaded = load_task(str(p))
    assert loaded.name == task.name
    assert loaded.label_dicts == task.label_dicts


def test_env_dir_takes_precedence(tmp_path, monkeypatch):
    shadow = TaskConfig(
        name="dummy_mtl_concat",
        csv_path="shadow.csv",
        label_dicts=({"A": 0}, {"Primary": 0, "Metastatic": 1}, {"F": 0, "M": 1}),
    )
    (tmp_path / "dummy_mtl_concat.json").write_text(shadow.to_json())
    monkeypatch.setenv("TOAD_TPU_TASK_DIR", str(tmp_path))
    assert task_search_dirs()[0] == tmp_path
    loaded = load_task("dummy_mtl_concat")
    assert loaded.csv_path == "shadow.csv"  # env dir shadows the builtin
    assert "dummy_mtl_concat" in list_tasks()


def test_missing_bag_file_error_names_path(tmp_path):
    """The verify-skill probe: a missing bag file fails with its full path."""
    import pandas as pd

    from toad_tpu.data.synthetic import dummy_task
    from toad_tpu.data.wsi_dataset import WSIBagDataset

    csv = tmp_path / "m.csv"
    pd.DataFrame([{"slide_id": "GONE", "case_id": "P0", "label": "Lung",
                   "site": "Primary", "sex": "F"}]).to_csv(csv, index=False)
    ds = WSIBagDataset(dummy_task(str(csv)), data_dir=str(tmp_path), print_info=False)
    with pytest.raises(FileNotFoundError, match="GONE"):
        ds.load_bag(0)


def test_load_task_by_name_with_json_suffix():
    """'name.json' without such a file in cwd still resolves via the search
    dirs (was probing name.json.json and failing)."""
    from toad_tpu.registry import load_task

    t = load_task("dummy_mtl_concat.json")
    assert t.name == "dummy_mtl_concat"


def test_task_json_unknown_fields_are_loud(tmp_path):
    import json

    import pytest

    from toad_tpu.config import TaskConfig

    good = {"name": "t", "csv_path": "x.csv", "label_dicts": [{"A": 0}, {"P": 0, "M": 1}, {"F": 0, "M": 1}]}
    TaskConfig.from_json(json.dumps(good))
    with pytest.raises(ValueError, match="unknown task-config fields.*description"):
        TaskConfig.from_json(json.dumps({**good, "description": "oops"}))


def test_top_level_exports_resolve():
    """Every name in toad_tpu.__all__ lazily resolves (catches stale
    _EXPORTS entries after refactors)."""
    import toad_tpu

    for name in toad_tpu.__all__:
        assert getattr(toad_tpu, name) is not None
    import pytest

    with pytest.raises(AttributeError, match="no attribute"):
        toad_tpu.not_a_symbol
