"""ViT (UNI-style) patch encoder: torch parity via a timm-layout state_dict,
dynamic pos-embed resizing, and TileEmbedder integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toad_tpu.models.vit_encoder import (
    ViTConfig,
    ViTEncoder,
    load_timm_weights,
    params_from_timm_state_dict,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

CFG = ViTConfig(patch_size=8, width=64, depth=2, heads=2, pretrain_img_size=32,
                layerscale=True, compute_dtype="float32")


class TorchBlock(nn.Module):
    """Pre-norm ViT block with LayerScale, timm naming (norm1/attn/ls1/norm2/mlp/ls2)."""

    def __init__(self, d, heads):
        super().__init__()
        self.d, self.heads = d, heads
        self.norm1 = nn.LayerNorm(d, eps=1e-6)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(d, 3 * d)
                self.proj = nn.Linear(d, d)

        self.attn = Attn()

        class LS(nn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = nn.Parameter(torch.full((d,), 1e-2))

        self.ls1 = LS()
        self.norm2 = nn.LayerNorm(d, eps=1e-6)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(d, 4 * d)
                self.fc2 = nn.Linear(4 * d, d)

        self.mlp = Mlp()
        self.ls2 = LS()

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        a = torch.softmax(a, dim=-1)
        o = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, d)
        x = x + self.attn.proj(o) * self.ls1.gamma
        h = self.norm2(x)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        return x + h * self.ls2.gamma


class TorchViT(nn.Module):
    def __init__(self, cfg=CFG):
        super().__init__()
        d, p = cfg.width, cfg.patch_size
        n = (cfg.pretrain_img_size // p) ** 2

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, d, p, stride=p)

        self.patch_embed = PE()
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + n, d) * 0.02)
        self.blocks = nn.Sequential(*[TorchBlock(d, cfg.heads) for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    @torch.no_grad()
    def forward(self, x):  # x NCHW
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), t], dim=1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        return self.norm(t[:, 0])


@pytest.fixture(scope="module")
def torch_vit():
    torch.manual_seed(0)
    m = TorchViT().eval()
    for p in m.parameters():
        if p.dim() > 1:
            nn.init.normal_(p, std=0.05)
    return m


def test_parity_with_torch(torch_vit):
    sd = {k: v.numpy() for k, v in torch_vit.state_dict().items()}
    params, cfg = params_from_timm_state_dict(sd)
    assert cfg.width == 64 and cfg.depth == 2 and cfg.layerscale
    enc = ViTEncoder(ViTConfig(**{**cfg.__dict__, "compute_dtype": "float32", "heads": 2}))
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    want = torch_vit(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pos_embed_resize_other_tile_size(torch_vit):
    """48x48 tiles (6x6 grid vs stored 4x4) run via bicubic pos-embed resize."""
    sd = {k: v.numpy() for k, v in torch_vit.state_dict().items()}
    params, cfg = params_from_timm_state_dict(sd)
    enc = ViTEncoder(ViTConfig(**{**cfg.__dict__, "compute_dtype": "float32", "heads": 2}))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 48, 48, 3).astype(np.float32))
    out = enc.apply(params, x)
    assert out.shape == (1, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_load_from_file_with_nesting(tmp_path, torch_vit):
    torch.save({"model": torch_vit.state_dict()}, tmp_path / "uni.bin")
    params, cfg = load_timm_weights(tmp_path / "uni.bin")
    enc = ViTEncoder(ViTConfig(**{**cfg.__dict__, "compute_dtype": "float32", "heads": 2}))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32))
    a = np.asarray(enc.apply(params, x))
    sd = {k: v.numpy() for k, v in torch_vit.state_dict().items()}
    params2, _ = params_from_timm_state_dict(sd)
    np.testing.assert_array_equal(a, np.asarray(enc.apply(params2, x)))


def test_random_init_full_size_shapes():
    cfg = ViTConfig()  # ViT-L/16
    enc = ViTEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    n = enc.param_count(params)
    assert 300_000_000 < n < 310_000_000  # ViT-L ~303M
    assert params["pos_embed"].shape == (1, 197, 1024)


def test_tile_embedder_vit(tmp_path):
    from toad_tpu.pipeline.featurize import TileEmbedder

    enc = ViTEncoder(CFG)
    params = enc.init(jax.random.PRNGKey(0))
    emb = TileEmbedder(params, CFG, batch_size=4)
    tiles = np.random.RandomState(0).randint(0, 256, (6, 32, 32, 3), np.uint8)
    feats = emb.embed_all(tiles)
    assert feats.shape == (6, 64)
    # matches direct call
    one = np.asarray(emb(tiles[:4]))
    np.testing.assert_allclose(feats[:4], one, rtol=1e-5)


def test_heads_inference_guard(torch_vit):
    """Explicit heads override is honored; non-multiple-of-64 widths without
    heads raise instead of silently mis-partitioning attention."""
    sd = {k: v.numpy() for k, v in torch_vit.state_dict().items()}
    _, cfg = params_from_timm_state_dict(sd, heads=2)
    assert cfg.heads == 2
    # fake a width-96 state dict surface by lying about cls_token only
    bad = dict(sd)
    bad["cls_token"] = np.zeros((1, 1, 96), np.float32)
    with pytest.raises(ValueError, match="pass heads"):
        params_from_timm_state_dict(bad)


class TestFusedAttention:
    """Pallas fused MHA (ops/vit_attention.py) — interpret-mode parity on the
    CPU mesh; the TPU Mosaic lowering guard lives in tests/test_pallas.py."""

    def test_kernel_matches_reference_f32(self):
        from toad_tpu.ops.vit_attention import fused_mha, mha_reference

        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((5, 33, 3 * 4 * 16)), jnp.float32)
        out = fused_mha(qkv, heads=4, head_dim=16, block_b=2, interpret=True)
        ref = mha_reference(qkv, heads=4, head_dim=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_kernel_matches_reference_bf16(self):
        from toad_tpu.ops.vit_attention import fused_mha, mha_reference

        rng = np.random.default_rng(1)
        qkv = jnp.asarray(rng.standard_normal((4, 17, 3 * 2 * 8)), jnp.bfloat16)
        out = fused_mha(qkv, heads=2, head_dim=8, interpret=True)
        ref = mha_reference(qkv, heads=2, head_dim=8)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_kernel_rejects_bad_width(self):
        from toad_tpu.ops.vit_attention import fused_mha

        with pytest.raises(ValueError, match="3\\*heads\\*head_dim"):
            fused_mha(jnp.zeros((1, 8, 100)), heads=2, head_dim=8, interpret=True)

    def test_full_encoder_fused_matches_xla(self):
        """End-to-end ViT forward: fused-attention output == XLA-attention
        output (f32 compute; the kernel accumulates context in f32, the XLA
        path in compute dtype — f32 makes both exact)."""
        enc_x = ViTEncoder(ViTConfig(**{**CFG.__dict__, "attention": "xla"}))
        enc_f = ViTEncoder(ViTConfig(**{**CFG.__dict__, "attention": "fused"}))
        params = enc_x.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        tiles = jnp.asarray(rng.uniform(0, 255, (3, 32, 32, 3)), jnp.float32)
        out_x = enc_x.embed(params, tiles)
        out_f = enc_f.embed(params, tiles)
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_f), rtol=1e-4, atol=1e-4)

    def test_auto_resolves_to_xla_off_tpu(self):
        from toad_tpu.models.vit_encoder import _resolve_attention

        fused, interpret = _resolve_attention(ViTConfig())
        if jax.default_backend() == "tpu":
            assert fused and not interpret
        else:
            assert not fused
        with pytest.raises(ValueError, match="auto\\|fused\\|xla"):
            _resolve_attention(ViTConfig(**{**CFG.__dict__, "attention": "banana"}))


class TestGeluForm:
    def test_resolution(self):
        from toad_tpu.models.vit_encoder import _resolve_gelu

        assert _resolve_gelu(ViTConfig(compute_dtype="bfloat16")) is True  # auto
        assert _resolve_gelu(ViTConfig(compute_dtype="float32")) is False  # auto
        assert _resolve_gelu(ViTConfig(gelu="tanh", compute_dtype="float32")) is True
        assert _resolve_gelu(ViTConfig(gelu="exact", compute_dtype="bfloat16")) is False
        with pytest.raises(ValueError, match="auto\\|exact\\|tanh"):
            _resolve_gelu(ViTConfig(gelu="banana"))

    def test_tanh_gelu_close_to_exact(self):
        """The tanh form must actually switch the math AND stay within the
        measured deviation envelope (1.9e-4 relative end-to-end on ViT-L;
        this tiny config tolerates more but the same order)."""
        # layerscale off: the default 1e-5 gamma shrinks the mlp branch below
        # f32 epsilon at this tiny width, hiding the GELU-form difference
        enc_e = ViTEncoder(ViTConfig(**{**CFG.__dict__, "gelu": "exact", "layerscale": False}))
        enc_t = ViTEncoder(ViTConfig(**{**CFG.__dict__, "gelu": "tanh", "layerscale": False}))
        params = enc_e.init(jax.random.PRNGKey(0))
        tiles = jnp.asarray(np.random.default_rng(3).uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
        oe = np.asarray(enc_e.embed(params, tiles))
        ot = np.asarray(enc_t.embed(params, tiles))
        dev = np.max(np.abs(oe - ot)) / (np.max(np.abs(oe)) + 1e-9)
        assert 0 < dev < 5e-3, dev
