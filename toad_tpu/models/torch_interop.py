"""Checkpoint interop with the reference's torch ``state_dict`` layout.

A reference user migrating to this framework can load their trained
``s_{fold}_checkpoint.pt`` files directly, and models trained here can be
exported back to files ``torch.load``-able by the reference eval script
(``eval_mtl_concat.py:105``, ``eval_utils_mtl_concat.py:27-29``).

Name map (reference ``models/model_toad.py:53-75``): the trunk+attention is
one ``nn.Sequential`` named ``attention_net`` whose indices shift with the
dropout flag (Dropout modules occupy slots 2 and 5 when enabled):

    attention_net.0          Linear 1024->512       -> params.trunk.fc1
    attention_net.{2|3}      Linear 512->512        -> params.trunk.fc2
    attention_net.{4|6}.attention_a.0  Linear 512->384 (tanh branch)   -> params.attn.a
    attention_net.{4|6}.attention_b.0  Linear 512->384 (sigmoid branch)-> params.attn.b
    attention_net.{4|6}.attention_c    Linear 384->2                   -> params.attn.c
    classifier               Linear 513->n_classes  -> params.cls_head
    site_classifier          Linear 513->2          -> params.site_head

torch Linear weights are [out, in]; ours are [in, out] (right-multiply,
MXU-friendly) — transposed on the way through. ``nn.DataParallel`` wrapping
(reference ``model_toad.py:79-81``) leaves ``attention_net.module.*`` names
in saved state; the ``module.`` segment is stripped.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from toad_tpu.config import ModelConfig
from toad_tpu.data.torch_io import load_torch_pickle, save_torch_pickle

Params = dict[str, Any]


def _strip_module(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    return {k.replace(".module.", ".").removeprefix("module."): np.asarray(v) for k, v in sd.items()}


def _detect_indices(sd: Mapping[str, str]) -> tuple[int, int]:
    """Return (fc2_idx, attn_idx): (3, 6) when the model was built with
    dropout, (2, 4) without."""
    if any(k.startswith("attention_net.3.") for k in sd):
        return 3, 6
    if any(k.startswith("attention_net.2.") for k in sd):
        return 2, 4
    raise KeyError("state dict has no attention_net.{2|3}.* keys — not a TOAD checkpoint")


def _lin_from(sd: Mapping[str, np.ndarray], name: str) -> dict[str, np.ndarray]:
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    b = np.asarray(sd[f"{name}.bias"], np.float32)
    return {"w": np.ascontiguousarray(w.T), "b": b}


def toad_params_from_state_dict(sd: Mapping[str, Any], config: ModelConfig | None = None) -> Params:
    """Reference torch state_dict -> ToadMIL params pytree (strict on the
    needed keys, tolerant of extras — torch's ``strict=False`` analog,
    reference ``eval_utils_mtl_concat.py:27-29``)."""
    sd = _strip_module(sd)
    fc2_idx, attn_idx = _detect_indices(sd)
    params: Params = {
        "trunk": {
            "fc1": _lin_from(sd, "attention_net.0"),
            "fc2": _lin_from(sd, f"attention_net.{fc2_idx}"),
        },
        "attn": {
            "a": _lin_from(sd, f"attention_net.{attn_idx}.attention_a.0"),
            "b": _lin_from(sd, f"attention_net.{attn_idx}.attention_b.0"),
            "c": _lin_from(sd, f"attention_net.{attn_idx}.attention_c"),
        },
        "cls_head": _lin_from(sd, "classifier"),
        "site_head": _lin_from(sd, "site_classifier"),
    }
    if config is not None:
        _check_shapes(params, config)
    return params


def _check_shapes(params: Params, c: ModelConfig) -> None:
    got_in, got_h = params["trunk"]["fc1"]["w"].shape
    if got_in != c.in_dim or got_h != c.hidden_dim:
        raise ValueError(f"trunk fc1 shape {(got_in, got_h)} != config {(c.in_dim, c.hidden_dim)}")
    got_cls = params["cls_head"]["w"].shape[1]
    if got_cls != c.n_classes:
        raise ValueError(f"checkpoint has {got_cls} classes, config expects {c.n_classes}")


def _lin_to(sd: dict[str, np.ndarray], name: str, lin: Mapping[str, Any]) -> None:
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(lin["w"], np.float32).T)
    sd[f"{name}.bias"] = np.asarray(lin["b"], np.float32)


def toad_state_dict_from_params(params: Params, dropout: bool = True) -> dict[str, np.ndarray]:
    """ToadMIL params pytree -> reference-layout flat state_dict (numpy)."""
    if "b" not in params["attn"]:
        raise ValueError(
            "un-gated (gate=False) models have no reference-compatible state_dict "
            "layout — the reference's Attn_Net path is a NameError (SURVEY §2.3.3); "
            "export is only defined for gated models"
        )
    fc2_idx, attn_idx = (3, 6) if dropout else (2, 4)
    sd: dict[str, np.ndarray] = {}
    _lin_to(sd, "attention_net.0", params["trunk"]["fc1"])
    _lin_to(sd, f"attention_net.{fc2_idx}", params["trunk"]["fc2"])
    _lin_to(sd, f"attention_net.{attn_idx}.attention_a.0", params["attn"]["a"])
    _lin_to(sd, f"attention_net.{attn_idx}.attention_b.0", params["attn"]["b"])
    _lin_to(sd, f"attention_net.{attn_idx}.attention_c", params["attn"]["c"])
    _lin_to(sd, "classifier", params["cls_head"])
    _lin_to(sd, "site_classifier", params["site_head"])
    return sd


def import_torch_checkpoint(path: str | os.PathLike, config: ModelConfig | None = None) -> Params:
    """Load a reference ``s_{fold}_checkpoint.pt`` into a params pytree."""
    obj = load_torch_pickle(path)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    # tolerate a full-training-state dict holding the model under 'state_dict'
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return toad_params_from_state_dict(obj, config)


def export_torch_checkpoint(path: str | os.PathLike, params: Params, dropout: bool = True) -> None:
    """Write params as a reference-compatible ``torch.load``-able file."""
    save_torch_pickle(path, toad_state_dict_from_params(params, dropout=dropout))
