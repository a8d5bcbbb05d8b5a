"""Stratified k-fold split generation and the three split-file formats.

Reproduces the observable behavior of the reference's split machinery:

- sampling semantics of ``generate_split`` (``utils/utils.py:87-126``):
  a single seed drives k successive splits; per class, val ids are drawn
  without replacement, then test ids from the remainder, and the (sorted)
  rest becomes train, optionally subsampled by ``label_frac``;
- patient-stratified expansion (``dataset_mtl_concat.py:200-219``);
- held-out test sampling (``dataset_mtl_concat.py:176-198``);
- file formats written by ``save_splits`` (``dataset_mtl_concat.py:16-28``):
  columnar ``splits_i.csv``, one-hot ``splits_i_bool.csv``, and the per-class
  count ``splits_i_descriptor.csv`` (``test_split_gen`` at ``:302-335``).

Determinism matches the reference exactly because the legacy numpy global
RNG it uses *is* a ``RandomState``; we use an explicit ``RandomState(seed)``
and the same draw order.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from toad_tpu.utils import invert_labels


@dataclass(frozen=True)
class SplitSpec:
    """One fold's (train, val, test) id arrays (slide- or patient-level)."""

    train: np.ndarray
    val: np.ndarray
    test: np.ndarray

    def validate_disjoint(self) -> None:
        if len(np.intersect1d(self.train, self.test)):
            raise ValueError("train/test overlap")
        if len(np.intersect1d(self.train, self.val)):
            raise ValueError("train/val overlap")
        if len(np.intersect1d(self.val, self.test)):
            raise ValueError("val/test overlap")


def generate_splits(
    cls_ids: Sequence[np.ndarray],
    val_num: Sequence[int],
    test_num: Sequence[int],
    samples: int,
    n_splits: int = 5,
    seed: int = 7,
    label_frac: float = 1.0,
    custom_test_ids: np.ndarray | None = None,
):
    """Yield ``n_splits`` :class:`SplitSpec`s with the reference's draw order."""
    indices = np.arange(samples).astype(int)
    if custom_test_ids is not None:
        custom_test_ids = np.asarray(custom_test_ids, dtype=int)
        indices = np.setdiff1d(indices, custom_test_ids)

    rng = np.random.RandomState(seed)
    for _ in range(n_splits):
        all_val: list[np.ndarray] = []
        all_test: list[np.ndarray] = []
        train: list[np.ndarray] = []

        if custom_test_ids is not None:
            all_test.append(custom_test_ids)

        for c in range(len(val_num)):
            possible = np.intersect1d(cls_ids[c], indices)
            remaining = possible

            if val_num[c] > 0:
                val_ids = rng.choice(possible, val_num[c], replace=False)
                remaining = np.setdiff1d(possible, val_ids)
                all_val.append(val_ids)

            if custom_test_ids is None and test_num[c] > 0:
                test_ids = rng.choice(remaining, test_num[c], replace=False)
                remaining = np.setdiff1d(remaining, test_ids)
                all_test.append(test_ids)

            if label_frac == 1:
                train.append(remaining)
            else:
                n = math.ceil(len(remaining) * label_frac)
                train.append(remaining[:n])

        yield SplitSpec(
            train=np.concatenate(train) if train else np.array([], int),
            val=np.concatenate(all_val) if all_val else np.array([], int),
            test=np.concatenate(all_test) if all_test else np.array([], int),
        )


def sample_held_out(cls_ids: Sequence[np.ndarray], test_num: Sequence[int], seed: int) -> np.ndarray:
    """Fixed held-out test ids, one draw per class (reference ``:176-198``)."""
    rng = np.random.RandomState(seed)
    ids = [rng.choice(cls_ids[c], test_num[c], replace=False) for c in range(len(test_num))]
    return np.concatenate(ids) if ids else np.array([], int)


def expand_patient_split(spec: SplitSpec, patient_ids: np.ndarray, case_ids: np.ndarray) -> SplitSpec:
    """Map patient-level id splits to slide-level indices (reference ``:207-216``)."""

    def expand(ids: np.ndarray) -> np.ndarray:
        out: list[np.ndarray] = []
        for idx in ids:
            out.append(np.where(case_ids == patient_ids[idx])[0])
        return np.concatenate(out) if out else np.array([], int)

    return SplitSpec(train=expand(spec.train), val=expand(spec.val), test=expand(spec.test))


# -- file formats -------------------------------------------------------------


def save_split_columnar(slide_ids_by_split: dict[str, Sequence[str]], filename: str | os.PathLike) -> None:
    """Ragged columnar format: columns train/val/test of slide ids
    (reference ``save_splits`` non-boolean branch, ``dataset_mtl_concat.py:18-20``)."""
    series = [pd.Series(list(v), name=k) for k, v in slide_ids_by_split.items()]
    df = pd.concat(series, ignore_index=True, axis=1)
    df.columns = list(slide_ids_by_split.keys())
    df.to_csv(filename)


def save_split_boolean(slide_ids_by_split: dict[str, Sequence[str]], filename: str | os.PathLike) -> None:
    """One-hot membership format (reference boolean branch, ``:21-26``)."""
    keys = list(slide_ids_by_split.keys())
    all_ids: list[str] = []
    lengths: list[int] = []
    for k in keys:
        ids = list(slide_ids_by_split[k])
        all_ids.extend(ids)
        lengths.append(len(ids))
    one_hot = np.eye(len(keys)).astype(bool)
    rows = np.repeat(one_hot, lengths, axis=0)
    pd.DataFrame(rows, index=all_ids, columns=keys).to_csv(filename)


def split_descriptor(
    spec: SplitSpec,
    getlabel,
    label_dicts: Sequence[dict[str, int]],
    num_classes: Sequence[int],
) -> pd.DataFrame:
    """Per-class sample counts per split, stacked over tasks
    (reference ``test_split_gen(return_descriptor=True)``, ``:302-335``)."""
    spec.validate_disjoint()
    dfs = []
    for task in range(len(label_dicts)):
        inv = invert_labels(label_dicts[task])
        index = [inv[i] for i in range(num_classes[task])]
        df = pd.DataFrame(0, index=index, columns=["train", "val", "test"], dtype=np.int64)
        for split_name, ids in (("train", spec.train), ("val", spec.val), ("test", spec.test)):
            labels = getlabel(ids, task)
            counts = np.bincount(labels, minlength=num_classes[task])
            for c in range(num_classes[task]):
                df.loc[index[c], split_name] = int(counts[c])
        dfs.append(df)
    return pd.concat(dfs, axis=0)


# both bool-format writers (ours and the reference's df.astype(bool).to_csv)
# emit literal True/False — never 0/1, which could be real numeric slide ids
_BOOL_TOKENS = {"True", "False", "TRUE", "FALSE", "true", "false"}


def load_split_csv(csv_path: str | os.PathLike) -> dict[str, list[str]]:
    """Read a split file into {split: [slide ids]} — either the columnar
    NaN-ragged format (reference ``get_split_from_df``, ``:221-238``) or the
    one-hot ``splits_i_bool.csv`` membership format (which the reference
    *writes*, ``dataset_mtl_concat.py:21-26``, but nothing can read back;
    auto-detected by all-boolean split columns with ids in the index column).

    Read with ``dtype=str``: the ragged val/test columns are NaN-padded, so
    pandas would otherwise infer float64 for all-numeric slide ids and
    ``astype(str)`` would yield '201.0' — which matches nothing in the
    manifest and silently produced empty splits."""
    df = pd.read_csv(csv_path, dtype=str)
    present = [k for k in ("train", "val", "test") if k in df.columns]
    if not present:
        raise ValueError(f"{csv_path} has none of train/val/test columns")
    cells = df[present].stack().dropna()
    if len(cells) and set(cells.unique()) <= _BOOL_TOKENS and len(df.columns) > len(present):
        ids = df[df.columns[0]].astype(str)  # index column holds the slide ids
        truthy = {"True", "TRUE", "true"}
        return {k: ids[df[k].isin(truthy)].tolist() for k in present}
    return {k: df[k].dropna().tolist() for k in present}


def split_file(split_dir: str | os.PathLike, fold: int, kind: str = "") -> Path:
    """Conventional split filenames: splits_{i}[_bool|_descriptor].csv."""
    suffix = f"_{kind}" if kind else ""
    return Path(split_dir) / f"splits_{fold}{suffix}.csv"
