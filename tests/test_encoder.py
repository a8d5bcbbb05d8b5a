"""Patch encoder: truncated ResNet-50 parity vs torch, BN folding, and
torchvision-layout weight ingestion (reference ``models/resnet_custom.py``).

The torch reference model here is written from the public ResNet-50
architecture (bottleneck 1-3-1 convs, BN, downsample on first block of each
stage) with torchvision's state_dict naming, so the converter is exercised on
the real key layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toad_tpu.config import EncoderConfig
from toad_tpu.models.resnet_encoder import (
    ResNetEncoder,
    apply_folded,
    fold_bn,
    load_torchvision_weights,
    make_embedder,
    params_from_torchvision_state_dict,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

CFG = EncoderConfig(compute_dtype="float32")  # fp32 on CPU for tight parity


def _torch_bottleneck(cin, width, stride, expansion=4):
    cout = width * expansion

    class B(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    return B()


class TorchTruncatedResNet50(nn.Module):
    """Stem + layers 1-3 + GAP -> 1024-d, torchvision naming."""

    def __init__(self, blocks=(3, 4, 6)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for s, n in enumerate(blocks):
            width = 64 * (2**s)
            stride = 1 if s == 0 else 2
            mods = []
            for b in range(n):
                mods.append(_torch_bottleneck(cin, width, stride if b == 0 else 1))
                cin = width * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*mods))
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    @torch.no_grad()
    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.avgpool(x).flatten(1)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchTruncatedResNet50().eval()
    # randomize BN stats so folding is actually exercised
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.normal_(1.0, 0.2)
            mod.bias.data.normal_(0, 0.2)
    return m


@pytest.fixture(scope="module")
def jx(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    return params_from_torchvision_state_dict(sd, CFG)


def test_parity_torch_vs_jax(torch_model, jx):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    want = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ResNetEncoder(CFG).apply(jx, jnp.asarray(x)))
    assert got.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_bn_folding_exact(jx):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    raw = np.asarray(ResNetEncoder(CFG).apply(jx, x))
    folded = np.asarray(apply_folded(CFG, fold_bn(jx, CFG), x))
    np.testing.assert_allclose(folded, raw, rtol=1e-4, atol=1e-5)


def test_load_from_pth_file(tmp_path, torch_model, jx):
    """torch.save'd state_dict (with extra layer4/fc-style keys) loads via the
    native parser; extras ignored like the reference's strict=False."""
    sd = torch_model.state_dict()
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    p = tmp_path / "resnet50-imagenet.pth"
    torch.save(sd, p)
    params = load_torchvision_weights(p, CFG)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    a = np.asarray(ResNetEncoder(CFG).apply(params, x))
    b = np.asarray(ResNetEncoder(CFG).apply(jx, x))
    np.testing.assert_array_equal(a, b)


def test_embedder_uint8_pipeline(jx):
    fp, embed_fn = make_embedder(CFG, jx)
    tiles = np.random.RandomState(3).randint(0, 256, (2, 64, 64, 3), np.uint8)
    feats = np.asarray(embed_fn(fp, jnp.asarray(tiles)))
    assert feats.shape == (2, 1024)
    assert np.isfinite(feats).all()


def test_random_init_shapes_and_stats():
    enc = ResNetEncoder(CFG)
    params = enc.init(jax.random.PRNGKey(0))
    # kaiming fan_out: std = sqrt(2 / (kh*kw*cout))
    w = np.asarray(params["stem"]["conv"])
    assert w.shape == (7, 7, 3, 64)
    expected = np.sqrt(2.0 / (7 * 7 * 64))
    assert abs(w.std() - expected) / expected < 0.1
    # truncated resnet50 trunk: ~8.5M params (full is 25.6M incl. layer4+fc)
    n = enc.param_count(params)
    assert 8_000_000 < n < 9_000_000
    x = jnp.asarray(np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32))
    out = enc.apply(params, x)
    assert out.shape == (1, 1024)


def test_fold_bn_is_idempotent():
    """fold_bn on already-folded params (stem included) is a no-op — a
    re-folded checkpoint or a reused make_embedder fp must not KeyError."""
    import jax

    from toad_tpu.config import EncoderConfig
    from toad_tpu.models.resnet_encoder import ResNetEncoder, fold_bn

    cfg = EncoderConfig(blocks=(1, 1), stem_width=8)
    params = ResNetEncoder(cfg).init(jax.random.PRNGKey(0))
    once = fold_bn(params, cfg)
    twice = fold_bn(once, cfg)
    for a, b in zip(jax.tree.leaves(once), jax.tree.leaves(twice)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_s2d_exact_parity():
    """The space-to-depth stem rewrite is the SAME math as the 7x7/2 conv
    (weights scattered by parity into a 4x4/1 kernel over 2x2-packed
    pixels) — outputs must match to float tolerance, and the full encoder
    must be flag-invariant."""
    import jax
    import jax.numpy as jnp

    from toad_tpu.config import EncoderConfig
    from toad_tpu.models.resnet_encoder import (
        ResNetEncoder,
        _conv,
        _stem_conv_s2d,
        apply_folded,
        fold_bn,
    )

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    direct = _conv(x, w, stride=2, padding=3, dt=jnp.float32, bias=bias)
    s2d = _stem_conv_s2d(x, w, jnp.float32, bias=bias)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct), rtol=1e-5, atol=1e-5)

    cfg_on = EncoderConfig(blocks=(1, 1), stem_width=8, compute_dtype="float32", stem_s2d=True)
    cfg_off = EncoderConfig(blocks=(1, 1), stem_width=8, compute_dtype="float32", stem_s2d=False)
    params = ResNetEncoder(cfg_on).init(jax.random.PRNGKey(0))
    folded = fold_bn(params, cfg_on)
    a = apply_folded(cfg_on, folded, x)
    b = apply_folded(cfg_off, folded, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
