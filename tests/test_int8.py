"""int8 quantized-inference path: quantizers, kernel/oracle parity, accuracy
vs the f32 path, and the SlideInference / eval-step integrations.

The scheme (ops/quantize.py): dynamic per-row activation scales + per-column
weight scales, int8 x int8 -> int32 GEMMs for the three big pooling matmuls,
everything else f32. No reference analog (torch f32 throughout,
``models/model_toad.py:90-99``) — accuracy is judged against OUR f32 path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toad_tpu.config import ModelConfig
from toad_tpu.models.toad_mil import ToadMIL
from toad_tpu.ops.quantize import (
    quantize_pool_params,
    quantize_rows,
    quantize_rows_np,
    xla_int8_pool,
)


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(in_dim=256, n_classes=6)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _bag(rng, b=2, n=256, d=256):
    x = rng.randn(b, n, d).astype(np.float32)
    mask = (rng.rand(b, n) > 0.25).astype(np.float32)
    mask[:, 0] = 1.0
    return jnp.asarray(x), jnp.asarray(mask)


def test_quantize_rows_roundtrip_and_twins():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 128).astype(np.float32) * rng.rand(64, 1) * 10
    x[7] = 0.0  # padding row
    qn, sn = quantize_rows_np(x)
    qj, sj = jax.device_get(quantize_rows(jnp.asarray(x)))
    # numpy and jnp twins agree exactly (same round-half-even)
    np.testing.assert_array_equal(qn, qj)
    np.testing.assert_allclose(sn, sj, rtol=1e-6)
    # dequantized error bounded by half an LSB per element
    err = np.abs(qn.astype(np.float32) * sn[:, None] - x)
    assert float(err.max()) <= float(sn.max()) * 0.5 + 1e-6
    assert np.all(qn[7] == 0)


def test_quantize_pool_params_ungated_raises(small_model):
    cfg = ModelConfig(in_dim=256, n_classes=6, gate=False)
    params = ToadMIL(cfg).init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="gated"):
        quantize_pool_params(params)


def test_int8_kernel_matches_oracle(small_model):
    """Pallas int8 kernel (interpret mode) vs the jnp oracle: identical
    integer GEMMs, so only the bf16 score/contrib dots differ."""
    from toad_tpu.ops.pallas_pool import pallas_pool_int8

    model, params = small_model
    qp = quantize_pool_params(params)
    rng = np.random.RandomState(1)
    x, mask = _bag(rng)
    xq, sx = quantize_rows(x)
    m0, s0 = xla_int8_pool(qp, xq, sx, mask)
    m1, attn, s1 = pallas_pool_int8(qp, xq, sx, mask, return_scores=True, interpret=True)
    m_rel = float(jnp.max(jnp.abs(m1 - m0)) / (jnp.max(jnp.abs(m0)) + 1e-9))
    assert m_rel < 5e-3, m_rel
    assert float(jnp.max(jnp.abs(s1 - s0))) < 5e-3
    # softmax weights normalized over real patches
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
    # classification-only variant agrees with the scored one
    m2, none = pallas_pool_int8(qp, xq, sx, mask, with_attention=False, interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-6)


def test_int8_pair_path_matches_single(small_model):
    """Even-batch classification dispatches to _pool_kernel_body_int8_pair
    (two bags per grid step). Same math as the single-bag body — per-row
    results must agree with an odd-batch run that takes the single path."""
    from toad_tpu.ops.pallas_pool import pallas_pool_int8

    model, params = small_model
    qp = quantize_pool_params(params)
    rng = np.random.RandomState(7)
    x, mask = _bag(rng, b=4, n=512)
    xq, sx = quantize_rows(x)
    m_pair, none = pallas_pool_int8(qp, xq, sx, mask, with_attention=False, interpret=True)
    assert none is None
    # odd batch (first 3 bags) -> single-bag path; rows must agree
    m_single, _ = pallas_pool_int8(qp, xq[:3], sx[:3], mask[:3], with_attention=False, interpret=True)
    np.testing.assert_allclose(np.asarray(m_pair[:3]), np.asarray(m_single), rtol=2e-5, atol=2e-5)
    # and both against the jnp oracle
    m0, _ = xla_int8_pool(qp, xq, sx, mask)
    rel = float(jnp.max(jnp.abs(m_pair - m0)) / (jnp.max(jnp.abs(m0)) + 1e-9))
    assert rel < 5e-3, rel


def test_int8_pair_fully_masked_slot(small_model):
    """Eval batches pad with empty slots (all-zero patch_mask). When such a
    slot shares a pair with a real bag, the real bag's result must be
    unaffected and the empty slot must stay finite (denom=0 guard)."""
    from toad_tpu.ops.pallas_pool import pallas_pool_int8

    model, params = small_model
    qp = quantize_pool_params(params)
    rng = np.random.RandomState(9)
    x, mask = _bag(rng, b=2, n=256)
    mask = np.array(mask)  # writable copy (np.asarray of a jax array is read-only)
    mask[1, :] = 0.0  # bag 1 is an empty padding slot
    mask = jnp.asarray(mask)
    xq, sx = quantize_rows(x)
    m, none = pallas_pool_int8(qp, xq, sx, mask, with_attention=False, interpret=True)
    assert none is None
    m = np.asarray(m)
    assert np.isfinite(m).all()
    # the real bag matches a solo run through the single-bag path
    m_solo, _ = pallas_pool_int8(qp, xq[:1], sx[:1], mask[:1], with_attention=False, interpret=True)
    np.testing.assert_allclose(m[0], np.asarray(m_solo)[0], rtol=2e-5, atol=2e-5)


def test_int8_close_to_f32_forward(small_model):
    """End output (logits) of apply_int8 stays close to the f32 apply —
    the quantization-noise budget for the whole pipeline."""
    model, params = small_model
    qp = quantize_pool_params(params)
    rng = np.random.RandomState(2)
    x, mask = _bag(rng, b=4)
    sex = jnp.asarray([0, 1, 0, 1], jnp.int32)
    out_f = model.apply(params, x, mask, sex, train=False)
    xq, sx = quantize_rows(x)
    out_q = model.apply_int8(params, qp, xq, sx, mask, sex)
    scale = float(jnp.max(jnp.abs(out_f.logits)))
    rel = float(jnp.max(jnp.abs(out_q.logits - out_f.logits))) / (scale + 1e-9)
    assert rel < 0.03, rel  # logits within 3% of the f32 dynamic range
    # pooled features even closer (pre-head)
    mrel = float(jnp.max(jnp.abs(out_q.features - out_f.features))) / (
        float(jnp.max(jnp.abs(out_f.features))) + 1e-9)
    assert mrel < 0.02, mrel


def test_slide_inference_int8_agrees_with_f32(small_model):
    from toad_tpu.pipeline.infer import SlideInference

    _, params = small_model
    cfg = ModelConfig(in_dim=256, n_classes=6)
    rng = np.random.RandomState(3)
    feats = rng.randn(200, 256).astype(np.float32)
    si_f = SlideInference(params, cfg, bucket_sizes=(256, 512))
    si_q = SlideInference(params, cfg, bucket_sizes=(256, 512), int8=True)
    pf = si_f.predict(feats, sex=1)
    pq = si_q.predict(feats, sex=1)
    np.testing.assert_allclose(pq.y_prob, pf.y_prob, atol=0.02)
    np.testing.assert_allclose(pq.site_prob, pf.site_prob, atol=0.02)
    assert pq.attention.shape == pf.attention.shape == (200,)
    # attention ranking is what heatmaps consume: top-10 sets mostly agree
    top_f = set(np.argsort(-pf.attention)[:10].tolist())
    top_q = set(np.argsort(-pq.attention)[:10].tolist())
    assert len(top_f & top_q) >= 7, (top_f, top_q)


def test_serve_batcher_int8(small_model):
    """DynamicBatcher(int8=True): handler-thread quantization, int8 queue
    payloads, predictions agree with the f32 batcher; attention requests
    still work (scored kernel variant)."""
    from toad_tpu.serve.batcher import DynamicBatcher, ServeConfig

    _, params = small_model
    cfg = ModelConfig(in_dim=256, n_classes=6)
    rng = np.random.RandomState(5)
    bags = [rng.randn(rng.randint(40, 200), 256).astype(np.float32) for _ in range(6)]
    scfg = dict(max_batch=4, max_wait_ms=2.0, bucket_sizes=(256, 512))
    with DynamicBatcher(params, cfg, ServeConfig(**scfg)) as bf, \
         DynamicBatcher(params, cfg, ServeConfig(**scfg, int8=True)) as bq:
        for bag in bags:
            pf = bf.predict(bag, sex=1)
            pq = bq.predict(bag, sex=1)
            np.testing.assert_allclose(pq.y_prob, pf.y_prob, atol=0.02)
            assert pq.attention.shape == (0,)  # need_attention off by default
        pa = bq.predict(bags[0], sex=0, attention=True)
        assert pa.attention.shape == (len(bags[0]),)
        assert np.all(np.isfinite(pa.attention))


def test_eval_step_int8_close(small_model):
    from toad_tpu.evaluate.runner import make_eval_step

    model, params = small_model
    rng = np.random.RandomState(4)
    x, mask = _bag(rng, b=4)
    batch = {
        "features": x,
        "patch_mask": mask,
        "bag_mask": jnp.ones((4,), jnp.float32),
        "label": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "site": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "sex": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    out_f = make_eval_step(model)(params, batch)
    out_q = make_eval_step(model, int8=True, params=params)(params, batch)
    np.testing.assert_allclose(np.asarray(out_q["y_prob"]), np.asarray(out_f["y_prob"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(out_q["site_prob"]), np.asarray(out_f["site_prob"]), atol=0.02)


def test_eval_step_int8_wire_matches_device_quantize(small_model):
    """int8 WIRE (rows quantized in the producer thread, 'scales' in the
    batch) vs the legacy device-side quantize: quantize_rows_np/quantize_rows
    are exact twins in isolation (test_quantize_rows_roundtrip_and_twins, and
    re-verified under a standalone jit), but fused into the full step graph
    XLA may rewrite the division (reciprocal-multiply), shifting border
    values by 1 quant LSB — so the contract is closeness at quantization-
    noise scale, not bit equality."""
    from toad_tpu.evaluate.runner import make_eval_step
    from toad_tpu.ops.quantize import quantize_rows_np

    model, params = small_model
    rng = np.random.RandomState(11)
    x, mask = _bag(rng, b=4)
    base = {
        "patch_mask": mask,
        "bag_mask": jnp.ones((4,), jnp.float32),
        "label": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "site": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "sex": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    step = make_eval_step(model, int8=True, params=params)
    out_dev = step(params, dict(base, features=x))

    xn = np.asarray(x)
    B, N, D = xn.shape
    q, s = quantize_rows_np(xn.reshape(B * N, D))
    out_wire = step(params, dict(base, features=q.reshape(B, N, D), scales=s.reshape(B, N)))
    np.testing.assert_allclose(np.asarray(out_wire["y_prob"]), np.asarray(out_dev["y_prob"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(out_wire["site_prob"]), np.asarray(out_dev["site_prob"]), atol=0.02)


def test_evaluate_split_int8_uses_int8_wire(dummy_env):
    """evaluate_split(int8=True) ships int8+scales over the wire by default
    and lands the same result as forcing the f32 wire (device quantize)."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.evaluate.engine import evaluate_split

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    split = ds.subset(np.arange(12))
    dim = split.load_bag(0).shape[1]  # match the dummy fixture's feature dim
    cfg = ModelConfig(in_dim=dim, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))

    seen = {}
    orig_init = BagBatcher.__init__

    def spy(self, *a, **kw):
        orig_init(self, *a, **kw)
        seen["transfer_dtype"] = self.transfer_dtype

    BagBatcher.__init__ = spy
    try:
        r_wire = evaluate_split(model, params, split, batch_size=4, bucket_sizes=(64, 128, 256), int8=True)
        assert seen["transfer_dtype"] == "int8"
        r_dev = evaluate_split(model, params, split, batch_size=4, bucket_sizes=(64, 128, 256),
                               int8=True, transfer_dtype="float32")
        assert seen["transfer_dtype"] == "float32"
    finally:
        BagBatcher.__init__ = orig_init
    pc = [c for c in r_wire.df.columns if c.startswith("p_")]
    # same-quantizer paths differ only by XLA's in-graph division rewrite
    # (<=1 quant LSB per element; see the step-level test above)
    np.testing.assert_allclose(r_wire.df[pc].values, r_dev.df[pc].values, atol=0.02)
    assert abs(r_wire.cls_auc - r_dev.cls_auc) < 0.02


def test_evaluate_split_keeps_float_wire_for_caller_supplied_step(dummy_env):
    """int8=True with a caller-supplied eval_step must NOT switch to the
    int8 wire: the caller's step may be a plain float step (historically a
    benign combination — int8 only affected step BUILDING), and feeding it
    raw -127..127 integers would be silently, confidently wrong."""
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.evaluate.engine import evaluate_split
    from toad_tpu.evaluate.runner import make_eval_step

    ds = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    split = ds.subset(np.arange(8))
    dim = split.load_bag(0).shape[1]
    cfg = ModelConfig(in_dim=dim, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))

    f32_step = make_eval_step(model)
    seen = {}
    orig_init = BagBatcher.__init__

    def spy(self, *a, **kw):
        orig_init(self, *a, **kw)
        seen["transfer_dtype"] = self.transfer_dtype

    BagBatcher.__init__ = spy
    try:
        r_reuse = evaluate_split(model, params, split, batch_size=4,
                                 bucket_sizes=(64, 128, 256), int8=True, eval_step=f32_step)
        assert seen["transfer_dtype"] == "float32"  # NOT 'int8'
    finally:
        BagBatcher.__init__ = orig_init
    r_f32 = evaluate_split(model, params, split, batch_size=4,
                           bucket_sizes=(64, 128, 256), eval_step=f32_step)
    pc = [c for c in r_f32.df.columns if c.startswith("p_")]
    np.testing.assert_array_equal(r_reuse.df[pc].values, r_f32.df[pc].values)

    # explicit int8 wire without an engine-built int8 step is refused loudly
    import pytest

    with pytest.raises(ValueError, match="int8"):
        evaluate_split(model, params, split, eval_step=f32_step, transfer_dtype="int8")
    with pytest.raises(ValueError, match="int8"):
        evaluate_split(model, params, split, transfer_dtype="int8")  # int8=False


def test_evaluate_split_int8_over_int8_store(dummy_env, tmp_path):
    """eval --int8 over an int8 STORE (save_int8_bag .npz): the native
    read-through ships the saved q+scales as-is, and the per-slide probs
    match evaluating the SAME store through the f32 path (transparent
    dequantize + on-device quantize) — proving store, wire, and device
    quantization all agree end-to-end."""
    from toad_tpu.data.bags import save_int8_bag
    from toad_tpu.data.batching import BagBatcher
    from toad_tpu.data.wsi_dataset import WSIBagDataset
    from toad_tpu.evaluate.engine import evaluate_split

    ds_f = WSIBagDataset(dummy_env["task"], data_dir=str(dummy_env["data_dir"]))
    store = tmp_path / "store"
    for i in range(12):
        bag = np.asarray(ds_f.subset([i]).load_bag(0), np.float32)
        save_int8_bag(store / f"{ds_f.slide_ids[i]}.npz", bag)
    ds_q = WSIBagDataset(dummy_env["task"], data_dir=str(store))
    split = ds_q.subset(np.arange(12))
    dim = split.load_bag(0).shape[1]
    cfg = ModelConfig(in_dim=dim, n_classes=18)
    model = ToadMIL(cfg)
    params = model.init(jax.random.PRNGKey(0))

    wires = []
    orig_init = BagBatcher.__init__

    def spy(self, *a, **kw):
        orig_init(self, *a, **kw)
        wires.append(self.transfer_dtype)

    BagBatcher.__init__ = spy
    try:
        r_q = evaluate_split(model, params, split, batch_size=4,
                             bucket_sizes=(64, 128, 256), int8=True)
        assert wires[-1] == "int8"
        r_f = evaluate_split(model, params, split, batch_size=4,
                             bucket_sizes=(64, 128, 256), int8=True,
                             transfer_dtype="float32")
        assert wires[-1] == "float32"
    finally:
        BagBatcher.__init__ = orig_init
    pc = [c for c in r_q.df.columns if c.startswith("p_")]
    np.testing.assert_allclose(r_q.df[pc].values, r_f.df[pc].values, atol=0.02)
    assert (r_q.df["Y_hat"].values == r_f.df["Y_hat"].values).mean() >= 0.9
