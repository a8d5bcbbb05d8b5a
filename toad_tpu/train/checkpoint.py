"""Checkpointing: full training state (params + optimizer + epoch + RNG),
resumable — a capability the reference lacks entirely (it saves a bare
``state_dict`` on val-loss improvement, never the optimizer, and has no
mid-training resume; ``core_utils_mtl_concat.py:80-85,148-151``).

Primary store is Orbax (directory per checkpoint, async-safe, TPU-friendly).
Directory naming keeps the reference convention ``s_{fold}_checkpoint`` so
eval tooling looks familiar. ``strict=False``-style partial restore
(reference ``eval_utils_mtl_concat.py:27-29``) is :func:`restore_params`,
which restores only the model params subtree.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def checkpoint_name(fold: int) -> str:
    return f"s_{fold}_checkpoint"


def save_checkpoint(path: str | os.PathLike, state: dict[str, Any]) -> None:
    """Atomically save a pytree state dict to `path` (a directory).

    The new snapshot is written to a sibling temp dir first and swapped in
    with os.replace, so the previous snapshot survives a preemption at any
    point during the write — crucial for the per-epoch resume snapshots,
    whose whole purpose is surviving mid-write kills."""
    import jax

    import uuid

    state = jax.tree.map(np.asarray, state)  # orbax rejects bare numpy scalars
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    # UNIQUE tmp dir per save: tensorstore's in-process OCDBT cache keys on
    # the kvstore path with recheck_cached_data=false, so REUSING one tmp
    # path across epochs can serve stale btree nodes pointing at data files
    # from the previous epoch's (renamed-away) tmp — observed as a rare
    # NOT_FOUND ("Error reading d/<hash>") mid-save under fold-parallel CV
    tmp = path.parent / f".tmp_{path.name}.{uuid.uuid4().hex[:8]}"
    old = path.parent / f".old_{path.name}"
    # Purge leftovers from killed saves: prior uniquely-suffixed tmp dirs
    # (plus their Orbax-internal `*.orbax-checkpoint-tmp*` siblings, matched
    # by the same glob), the legacy un-suffixed tmp name, and Orbax internals
    # beside the TARGET: a kill mid-save leaves one behind, and letting
    # orbax's own "remove unfinalized" handling find it races its async
    # commit thread (observed: ENOENT on the ocdbt lock rename, killing the run)
    stales = [old, path.parent / f".tmp_{path.name}"]
    stales.extend(path.parent.glob(f".tmp_{path.name}.*"))
    stales.extend(path.parent.glob(f".tmp_{path.name}.orbax-checkpoint-tmp*"))
    stales.extend(path.parent.glob(f"{path.name}.orbax-checkpoint-tmp*"))
    for stale in stales:
        # orbax normally leaves directories, but guard against a plain file
        # (rmtree on a file raises NotADirectoryError and would kill the very
        # save this purge is meant to protect)
        if stale.is_dir():
            shutil.rmtree(stale)
        elif stale.exists():
            stale.unlink()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, state)
        ckptr.wait_until_finished()
    # two renames instead of rmtree-then-rename: a kill at any point leaves
    # either the new snapshot at `path` or the previous one recoverable at
    # `old` (see recover_checkpoint) — never zero snapshots
    if path.exists():
        os.replace(path, old)
    os.replace(tmp, path)
    if old.exists():
        shutil.rmtree(old)


def recover_checkpoint(path: str | os.PathLike) -> Path | None:
    """Resolve `path` to a usable snapshot: itself, or the rename-aside
    `.old_<name>` left by a preemption inside save_checkpoint's swap window
    (in which case the previous epoch's snapshot is restored into place).
    Returns None when neither exists."""
    path = Path(path).absolute()
    if path.exists():
        return path
    old = path.parent / f".old_{path.name}"
    if old.exists():
        os.replace(old, path)
        return path
    return None


def restore_checkpoint(path: str | os.PathLike, template: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore a state dict; `template` (abstract or concrete pytree) pins
    structure/dtypes when provided."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            template = jax.tree.map(np.asarray, template)  # no bare numpy scalars
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def restore_params(path: str | os.PathLike, params_template: Any | None = None) -> Any:
    """Partial restore of just the model params — tolerant of checkpoints that
    carry extra state (optimizer, epoch), like torch's ``strict=False``.

    The restore itself is unconstrained (the checkpoint may hold more than
    params, so a params-only template can't pin the Orbax structure); the
    template is enforced afterwards: missing keys and shape mismatches fail
    HERE with the parameter path named, not later inside ``model.apply``."""
    state = restore_checkpoint(path)
    params = state["params"] if isinstance(state, dict) and "params" in state else state
    if params_template is not None:
        params = _project_like(params, params_template)
        _check_shapes_like(params, params_template)
    return jax.tree.map(np.asarray, params)


def _project_like(src: Any, template: Any, where: str = "params") -> Any:
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if not isinstance(src, dict) or k not in src:
                have = sorted(src.keys()) if isinstance(src, dict) else type(src).__name__
                raise KeyError(
                    f"checkpoint missing parameter {where}/{k} required by the model (has: {have})"
                )
            out[k] = _project_like(src[k], v, f"{where}/{k}")
        return out
    return src


def _check_shapes_like(params: Any, template: Any, where: str = "params") -> None:
    if isinstance(template, dict):
        for k, v in template.items():
            _check_shapes_like(params[k], v, f"{where}/{k}")
        return
    got = tuple(getattr(params, "shape", np.shape(params)))
    want = tuple(getattr(template, "shape", np.shape(template)))
    if got != want:
        raise ValueError(
            f"checkpoint/model shape mismatch at {where}: checkpoint {got} vs model {want} "
            "(was this checkpoint trained with a different model_size/n_classes?)"
        )


def load_params_any(ckpt_path: str | os.PathLike, model_cfg=None, template: Any | None = None):
    """Load ToadMIL params from either an Orbax checkpoint directory (ours)
    or a reference torch ``s_{fold}_checkpoint.pt`` file — sniffed by path
    type, with a ``.pt`` suffix fallback for reference-style bare names. The
    ONE loading policy shared by :class:`SlideInference`, the serving
    :class:`InferenceService`, and the eval engine. ``template`` (optional)
    makes the Orbax restore shape-checked."""
    p = Path(ckpt_path)
    if p.is_dir():
        return restore_params(p, template)
    from toad_tpu.models.torch_interop import import_torch_checkpoint

    f = p if p.exists() else p.with_suffix(".pt")
    if not f.exists():
        raise FileNotFoundError(f"checkpoint not found: {p} (or {f})")
    return import_torch_checkpoint(f, model_cfg)
