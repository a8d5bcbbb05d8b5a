"""Checkpoint interop: reference-layout torch state_dicts <-> ToadMIL params.

The torch side of each test builds the reference's module layout
(``models/model_toad.py:53-75``: ``attention_net`` Sequential with
``Attn_Net_Gated`` at the end, ``classifier``, ``site_classifier``) from its
documented structure so `s_{fold}_checkpoint.pt` files round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toad_tpu.config import ModelConfig
from toad_tpu.data.torch_io import load_torch_pickle, save_torch_pickle
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.models.torch_interop import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    toad_params_from_state_dict,
    toad_state_dict_from_params,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def make_reference_layout_module(in_dim=48, hidden=512, attn=384, n_classes=7, dropout=True):
    """Reference module tree (names only matter for state_dict layout)."""

    class Gated(nn.Module):
        def __init__(self):
            super().__init__()
            a = [nn.Linear(hidden, attn), nn.Tanh()]
            b = [nn.Linear(hidden, attn), nn.Sigmoid()]
            if dropout:
                a.append(nn.Dropout(0.25))
                b.append(nn.Dropout(0.25))
            self.attention_a = nn.Sequential(*a)
            self.attention_b = nn.Sequential(*b)
            self.attention_c = nn.Linear(attn, 2)

        def forward(self, x):
            return self.attention_c(self.attention_a(x) * self.attention_b(x)), x

    class Toad(nn.Module):
        def __init__(self):
            super().__init__()
            fc = [nn.Linear(in_dim, hidden), nn.ReLU()]
            if dropout:
                fc.append(nn.Dropout(0.25))
            fc.extend([nn.Linear(hidden, hidden), nn.ReLU()])
            if dropout:
                fc.append(nn.Dropout(0.25))
            fc.append(Gated())
            self.attention_net = nn.Sequential(*fc)
            self.classifier = nn.Linear(hidden + 1, n_classes)
            self.site_classifier = nn.Linear(hidden + 1, 2)

        @torch.no_grad()
        def forward(self, h, sex):
            scores, h = self.attention_net(h)
            attn = torch.softmax(scores.t(), dim=1)
            m = attn @ h
            m = torch.cat([m, torch.full((2, 1), float(sex))], dim=1)
            return self.classifier(m[0:1]), self.site_classifier(m[1:2])

    return Toad()


@pytest.mark.parametrize("dropout", [True, False])
def test_import_reference_checkpoint(tmp_path, dropout):
    tmod = make_reference_layout_module(dropout=dropout).eval()
    ckpt = tmp_path / "s_0_checkpoint.pt"
    torch.save(tmod.state_dict(), ckpt)

    cfg = ModelConfig(in_dim=48, n_classes=7)
    params = import_torch_checkpoint(ckpt, cfg)
    model = ToadMIL(cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(60, 48).astype(np.float32)
    logits_t, site_t = tmod(torch.from_numpy(x), 1)
    out = model.apply(params, jnp.asarray(x[None]), jnp.ones((1, 60)), jnp.array([1]))
    np.testing.assert_allclose(np.asarray(out.logits), logits_t.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.site_logits), site_t.numpy(), rtol=1e-2, atol=1e-3)


def test_export_loads_into_torch_strict(tmp_path):
    cfg = ModelConfig(in_dim=48, n_classes=7)
    model = ToadMIL(cfg)
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    out = tmp_path / "export.pt"
    export_torch_checkpoint(out, params, dropout=True)

    tmod = make_reference_layout_module(dropout=True).eval()
    sd = torch.load(out, map_location="cpu", weights_only=True)
    tmod.load_state_dict(sd, strict=True)  # exact reference layout

    rng = np.random.RandomState(1)
    x = rng.randn(33, 48).astype(np.float32)
    logits_t, site_t = tmod(torch.from_numpy(x), 0)
    o = model.apply(params, jnp.asarray(x[None]), jnp.ones((1, 33)), jnp.array([0]))
    np.testing.assert_allclose(np.asarray(o.logits), logits_t.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(o.site_logits), site_t.numpy(), rtol=1e-2, atol=1e-3)


def test_dataparallel_module_prefix_stripped(tmp_path):
    tmod = make_reference_layout_module()
    sd = tmod.state_dict()
    # DataParallel wrapping (reference model_toad.py:79-81) produces
    # attention_net.module.* names
    wrapped = {}
    for k, v in sd.items():
        if k.startswith("attention_net."):
            wrapped["attention_net.module." + k[len("attention_net."):]] = v
        else:
            wrapped[k] = v
    params = toad_params_from_state_dict({k: v.numpy() for k, v in wrapped.items()})
    np.testing.assert_allclose(params["trunk"]["fc1"]["w"], sd["attention_net.0.weight"].numpy().T)


def test_roundtrip_params_exact(tmp_path):
    cfg = ModelConfig(in_dim=32, n_classes=5)
    model = ToadMIL(cfg)
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(3)))
    sd = toad_state_dict_from_params(params)
    back = toad_params_from_state_dict(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_raises(tmp_path):
    cfg = ModelConfig(in_dim=48, n_classes=7)
    model = ToadMIL(cfg)
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    p = tmp_path / "x.pt"
    export_torch_checkpoint(p, params)
    bad_cfg = ModelConfig(in_dim=48, n_classes=9)
    with pytest.raises(ValueError, match="classes"):
        import_torch_checkpoint(p, bad_cfg)


def test_save_torch_pickle_full_state(tmp_path):
    """Full training state (params+opt+step) written natively is loadable by
    torch and by our own reader."""
    state = {
        "params": {"w": np.random.randn(3, 4).astype(np.float32)},
        "step": 17,
        "rng": np.arange(2, dtype=np.uint32),
    }
    p = tmp_path / "full.pt"
    save_torch_pickle(p, state)
    ours = load_torch_pickle(p)
    assert ours["step"] == 17
    theirs = torch.load(p, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(theirs["params"]["w"].numpy(), state["params"]["w"])


def test_ungated_export_raises_clearly():
    cfg = ModelConfig(in_dim=32, n_classes=5, gate=False)
    params = jax.tree.map(np.asarray, ToadMIL(cfg).init(jax.random.PRNGKey(0)))
    with pytest.raises(ValueError, match="un-gated"):
        toad_state_dict_from_params(params)


def test_eval_engine_accepts_reference_checkpoint_file(tmp_path, dummy_env):
    """A reference models dir (s_k_checkpoint.pt files) evaluates as-is
    through the engine, including the bare path without .pt extension the
    CLI constructs from checkpoint_name()."""
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.evaluate.engine import evaluate_checkpoint

    dim = dummy_env["dim"]
    cfg = ModelConfig(in_dim=dim, n_classes=18)
    params = jax.tree.map(np.asarray, ToadMIL(cfg).init(jax.random.PRNGKey(0)))
    export_torch_checkpoint(tmp_path / "s_0_checkpoint.pt", params)

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]), print_info=False)
    split = ds.subset(np.arange(12))
    r1 = evaluate_checkpoint(tmp_path / "s_0_checkpoint.pt", split, cfg, batch_size=4)
    r2 = evaluate_checkpoint(tmp_path / "s_0_checkpoint", split, cfg, batch_size=4)  # CLI-style bare name
    assert len(r1.df) == 12
    np.testing.assert_array_equal(
        r1.df[[f"p_{c}" for c in range(18)]].to_numpy(),
        r2.df[[f"p_{c}" for c in range(18)]].to_numpy(),
    )


def test_export_cli_roundtrip(tmp_path):
    """`python -m toad_tpu export` converts an Orbax checkpoint into the
    reference state_dict layout; re-importing yields identical params."""
    from toad_tpu.cli import export as export_cli
    from toad_tpu.train.checkpoint import load_params_any, save_checkpoint

    cfg = ModelConfig(in_dim=32, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(3))
    ckpt_dir = tmp_path / "s_0_checkpoint"
    save_checkpoint(ckpt_dir, params)

    out = tmp_path / "exported" / "s_0_checkpoint.pt"
    export_cli.main(
        ["--ckpt", str(ckpt_dir), "--out", str(out), "--encoding_size", "32", "--n_classes", "18"]
    )
    back = load_params_any(out, cfg, template=model.init(jax.random.PRNGKey(0)))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
