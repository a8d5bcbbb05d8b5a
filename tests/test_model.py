"""Model math: shapes, padding invariance, and numerical parity against a
torch-functional computation of the same architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toad_tpu.config import ModelConfig
from toad_tpu.models.toad_mil import ToadMIL


def small_cfg(**kw):
    return ModelConfig(in_dim=32, n_classes=5, **{"size_arg": "small", **kw})


def test_shapes_and_outputs():
    cfg = ModelConfig(in_dim=64, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B, N = 3, 100
    x = jnp.asarray(np.random.randn(B, N, 64), jnp.float32)
    mask = jnp.ones((B, N))
    sex = jnp.array([0, 1, 1])
    out = model.apply(params, x, mask, sex)
    assert out.logits.shape == (B, 18)
    assert out.site_logits.shape == (B, 2)
    assert out.y_prob.shape == (B, 18)
    assert out.attention.shape == (B, 2, N)
    assert out.features.shape == (B, 2, 513)
    np.testing.assert_allclose(np.asarray(out.y_prob).sum(-1), 1.0, rtol=1e-5)


def test_padding_invariance():
    """A bag padded with masked garbage must give identical outputs (SURVEY §4)."""
    cfg = ModelConfig(in_dim=32, n_classes=4)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    n = 57
    bag = rng.randn(1, n, 32).astype(np.float32)
    sex = jnp.array([1])

    out_exact = model.apply(params, jnp.asarray(bag), jnp.ones((1, n)), sex)

    n_pad = 128
    padded = np.concatenate([bag, 1e3 * rng.randn(1, n_pad - n, 32).astype(np.float32)], axis=1)
    mask = np.zeros((1, n_pad), np.float32)
    mask[:, :n] = 1
    out_pad = model.apply(params, jnp.asarray(padded), jnp.asarray(mask), sex)

    np.testing.assert_allclose(np.asarray(out_pad.logits), np.asarray(out_exact.logits), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pad.site_logits), np.asarray(out_exact.site_logits), rtol=2e-5, atol=2e-5)
    # masked attention weights are exactly zero
    attn_pad = np.asarray(out_pad.attention)
    assert np.all(np.isneginf(attn_pad[:, :, n:]))


def test_attention_only():
    cfg = small_cfg()
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.randn(2, 40, 32), jnp.float32)
    a = model.apply(params, x, jnp.ones((2, 40)), jnp.array([0, 1]), attention_only=True)
    assert a.shape == (2, 40)


def test_batch_consistency():
    """Bags evaluated in a batch equal bags evaluated alone.

    Tolerance note: XLA picks different matmul reduction paths for different
    leading batch dims (verified: the [B,513]@[513,C] head matmul alone
    differs ~6e-4 between B=1 and B=4 on CPU), so exact equality is not
    achievable; the math upstream of the heads is bit-identical."""
    cfg = small_cfg()
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    x = rng.randn(4, 64, 32).astype(np.float32)
    mask = np.ones((4, 64), np.float32)
    sex = np.array([0, 1, 0, 1])
    out_b = model.apply(params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(sex))
    for i in range(4):
        out_i = model.apply(params, jnp.asarray(x[i : i + 1]), jnp.asarray(mask[i : i + 1]), jnp.asarray(sex[i : i + 1]))
        np.testing.assert_allclose(np.asarray(out_b.logits)[i], np.asarray(out_i.logits)[0], rtol=5e-2, atol=2e-3)


def test_torch_functional_parity():
    """Same weights, same input → same logits as a torch-functional build of
    the architecture (trunk → gated attention → softmax pool → sex concat →
    heads, reference model_toad.py:90-116)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = ModelConfig(in_dim=48, n_classes=7)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(4))
    p = jax.tree.map(np.asarray, params)

    rng = np.random.RandomState(2)
    n = 90
    x = rng.randn(n, 48).astype(np.float32)
    sex = 1.0

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in {
        "w1": p["trunk"]["fc1"]["w"], "b1": p["trunk"]["fc1"]["b"],
        "w2": p["trunk"]["fc2"]["w"], "b2": p["trunk"]["fc2"]["b"],
        "wa": p["attn"]["a"]["w"], "ba": p["attn"]["a"]["b"],
        "wb": p["attn"]["b"]["w"], "bb": p["attn"]["b"]["b"],
        "wc": p["attn"]["c"]["w"], "bc": p["attn"]["c"]["b"],
        "wcls": p["cls_head"]["w"], "bcls": p["cls_head"]["b"],
        "wsite": p["site_head"]["w"], "bsite": p["site_head"]["b"],
    }.items()}

    xt = torch.from_numpy(x)
    h = F.relu(xt @ t["w1"] + t["b1"])
    h = F.relu(h @ t["w2"] + t["b2"])
    a = torch.tanh(h @ t["wa"] + t["ba"])
    g = torch.sigmoid(h @ t["wb"] + t["bb"])
    scores = (a * g) @ t["wc"] + t["bc"]  # [N, 2]
    attn = torch.softmax(scores.t(), dim=1)  # [2, N]
    m = attn @ h  # [2, H]
    m = torch.cat([m, torch.full((2, 1), sex)], dim=1)
    logits_t = (m[0:1] @ t["wcls"] + t["bcls"]).numpy()
    site_t = (m[1:2] @ t["wsite"] + t["bsite"]).numpy()

    out = model.apply(params, jnp.asarray(x[None]), jnp.ones((1, n)), jnp.array([1]))
    # fp32 reduction-order noise between XLA-CPU and torch-CPU is ~6e-4 on
    # this depth of stack; semantic parity is what's asserted.
    np.testing.assert_allclose(np.asarray(out.logits), logits_t, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.site_logits), site_t, rtol=2e-2, atol=2e-3)


def test_xavier_init_stats():
    cfg = ModelConfig(in_dim=1024, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    w = np.asarray(params["trunk"]["fc1"]["w"])
    expected_std = np.sqrt(2.0 / (1024 + 512))
    assert abs(w.std() - expected_std) / expected_std < 0.05
    assert np.all(np.asarray(params["trunk"]["fc1"]["b"]) == 0)


def test_dropout_train_mode():
    cfg = small_cfg(dropout=True)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(5))
    x = jnp.asarray(np.random.randn(2, 30, 32), jnp.float32)
    mask = jnp.ones((2, 30))
    sex = jnp.array([0, 1])
    o1 = model.apply(params, x, mask, sex, train=True, rng=jax.random.PRNGKey(1))
    o2 = model.apply(params, x, mask, sex, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(o1.logits), np.asarray(o2.logits))
    # eval mode is deterministic
    e1 = model.apply(params, x, mask, sex)
    e2 = model.apply(params, x, mask, sex)
    np.testing.assert_array_equal(np.asarray(e1.logits), np.asarray(e2.logits))


def test_need_attention_false_same_logits():
    """The classification-only fast path (skips A_raw/scores) must produce
    identical logits to the default path."""
    cfg = small_cfg()
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(6))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 50, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(3, 50) < 0.8).astype(np.float32))
    sex = jnp.array([0, 1, 0])
    full = model.apply(params, x, mask, sex)
    lean = model.apply(params, x, mask, sex, need_attention=False)
    np.testing.assert_allclose(np.asarray(lean.logits), np.asarray(full.logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lean.site_logits), np.asarray(full.site_logits), atol=1e-5)
    assert lean.attention is None


def test_ungated_attention_variant():
    """gate=False: scores = Wc tanh(Wa h) — the reference's NameError path,
    working here (SURVEY §2.3.3). Covers eval, dropout-train, and the pallas
    flag falling back to XLA."""
    cfg = small_cfg(gate=False, dropout=True)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(7))
    assert "b" not in params["attn"]
    x = jnp.asarray(np.random.RandomState(4).randn(2, 40, 32), jnp.float32)
    mask = jnp.ones((2, 40))
    sex = jnp.array([0, 1])
    out = model.apply(params, x, mask, sex)
    np.testing.assert_allclose(np.asarray(out.y_prob).sum(-1), 1.0, rtol=1e-5)
    o_train = model.apply(params, x, mask, sex, train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(o_train.logits)).all()
    # pallas flag silently falls back to XLA for the ungated variant
    cfg_p = small_cfg(gate=False, use_pallas=True)
    out_p = ToadMIL(cfg_p).apply(params, x, mask, sex)
    np.testing.assert_allclose(np.asarray(out_p.logits), np.asarray(out.logits), atol=1e-5)

    # parity with a direct functional computation
    p = jax.tree.map(np.asarray, params)
    h = np.maximum(np.asarray(x) @ p["trunk"]["fc1"]["w"] + p["trunk"]["fc1"]["b"], 0)
    h = np.maximum(h @ p["trunk"]["fc2"]["w"] + p["trunk"]["fc2"]["b"], 0)
    scores = np.tanh(h @ p["attn"]["a"]["w"] + p["attn"]["a"]["b"]) @ p["attn"]["c"]["w"] + p["attn"]["c"]["b"]
    e = np.exp(scores - scores.max(1, keepdims=True))
    w = e / e.sum(1, keepdims=True)  # [B, N, T]
    m = np.einsum("bnt,bnh->bth", w, h)
    feats0 = np.concatenate([m[:, 0], np.asarray(sex, np.float32)[:, None]], 1)
    logits = feats0 @ p["cls_head"]["w"] + p["cls_head"]["b"]
    np.testing.assert_allclose(np.asarray(out.logits), logits, rtol=1e-3, atol=1e-4)
