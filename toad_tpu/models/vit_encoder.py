"""ViT patch encoder (ViT-L/16 "UNI"-style) — the foundation-model stretch
config of BASELINE.json (config 5).

Pathology foundation models like UNI (Chen et al. 2024) are timm ViT-L/16
checkpoints trained with the DINOv2 recipe: pre-norm transformer blocks with
LayerScale, standard GELU MLP, a cls token whose final-norm embedding is the
1024-d tile feature — a drop-in replacement for the truncated ResNet-50
(reference ``models/resnet_custom.py``) at the same feature width
(``main_mtl_concat.py:123``).

TPU-first choices:
- bf16 matmuls with f32 LayerNorm/softmax statistics;
- one jitted program per tile shape; position embeddings are bicubically
  resized on the fly for non-224 tiles (timm ``dynamic_img_size`` analog);
- weight ingestion from timm-layout torch state_dicts via the native
  torch-zip parser (no torch/timm needed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class ViTConfig:
    """ViT-L/16 by default (UNI's architecture)."""

    patch_size: int = 16
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    pretrain_img_size: int = 224  # grid the stored pos_embed was trained at
    layerscale: bool = True  # DINOv2/UNI use LayerScale; vanilla ViT doesn't
    ln_eps: float = 1e-6
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # attention core: 'fused' = Pallas VMEM-resident MHA (ops/vit_attention.py
    # — measured +~45% end-to-end on v5e, where XLA's materialized [B,H,N,N]
    # f32 scores cost 43% of encoder wall time), 'xla' = einsum+softmax,
    # 'auto' = fused on TPU, xla elsewhere (interpret-mode Pallas would crawl
    # on the CPU test mesh)
    attention: str = "auto"
    # GELU form: 'exact' = erf (timm's nn.GELU), 'tanh' = the tanh
    # approximation (+18.6% tiles/s on v5e — erf is VPU-expensive;
    # experiments/vit_elementwise_probe.py), 'auto' = tanh under bf16 compute
    # (measured end-to-end feature deviation 1.9e-4 relative, 2.6x BELOW the
    # bf16 reduction-order noise floor of ~5e-4 — CLAUDE.md), exact under f32
    # (bit-fidelity mode; torch parity is tested there)
    gelu: str = "auto"

    @property
    def out_dim(self) -> int:
        return self.width

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# ---------------------------------------------------------------------------
# Init (truncated-normal .02 like timm; LS gamma 1e-5 like DINOv2)
# ---------------------------------------------------------------------------


def _tn(key, shape, dtype, std=0.02):
    return (jax.random.truncated_normal(key, -2, 2, shape) * std).astype(dtype)


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


class ViTEncoder:
    """init/apply container for the UNI-style ViT tile encoder (pure
    functions; params are a plain pytree — same contract as
    :class:`~toad_tpu.models.resnet_encoder.ResNetEncoder`)."""

    def __init__(self, config: ViTConfig = ViTConfig()):
        self.config = config
        self._init_jit = None

    def init(self, key: jax.Array) -> Params:
        """One jitted program — per-tensor RNG dispatches are pathologically
        slow through remote-device transports (~150 round-trips for ViT-L).
        The wrapper is cached so repeated init() calls reuse the compile."""
        if self._init_jit is None:
            self._init_jit = jax.jit(self._init_impl)
        return self._init_jit(key)

    def _init_impl(self, key: jax.Array) -> Params:
        c = self.config
        dt = jnp.dtype(c.param_dtype)
        n_grid = c.pretrain_img_size // c.patch_size
        keys = iter(jax.random.split(key, 4 + 6 * c.depth))
        params: Params = {
            "patch_embed": {
                "w": _tn(next(keys), (c.patch_size, c.patch_size, 3, c.width), dt),
                "b": jnp.zeros((c.width,), jnp.float32),
            },
            "cls_token": jnp.zeros((1, 1, c.width), dt),
            "pos_embed": _tn(next(keys), (1, 1 + n_grid * n_grid, c.width), dt),
            "norm": _ln_init(c.width),
            "blocks": [],
        }
        for _ in range(c.depth):
            blk = {
                "norm1": _ln_init(c.width),
                "qkv": {"w": _tn(next(keys), (c.width, 3 * c.width), dt), "b": jnp.zeros((3 * c.width,), jnp.float32)},
                "proj": {"w": _tn(next(keys), (c.width, c.width), dt), "b": jnp.zeros((c.width,), jnp.float32)},
                "norm2": _ln_init(c.width),
                "fc1": {"w": _tn(next(keys), (c.width, c.mlp_ratio * c.width), dt), "b": jnp.zeros((c.mlp_ratio * c.width,), jnp.float32)},
                "fc2": {"w": _tn(next(keys), (c.mlp_ratio * c.width, c.width), dt), "b": jnp.zeros((c.width,), jnp.float32)},
            }
            if c.layerscale:
                blk["ls1"] = jnp.full((c.width,), 1e-5, jnp.float32)
                blk["ls2"] = jnp.full((c.width,), 1e-5, jnp.float32)
            params["blocks"].append(blk)
        return params

    # -- forward ---------------------------------------------------------------

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        """Normalized float tiles [B, H, W, 3] -> cls features [B, width]."""
        c = self.config
        dt = jnp.dtype(c.compute_dtype)
        b, hh, ww, _ = x.shape
        if hh % c.patch_size or ww % c.patch_size:
            raise ValueError(f"tile {hh}x{ww} not divisible by patch size {c.patch_size}")
        gh, gw = hh // c.patch_size, ww // c.patch_size

        tokens = jax.lax.conv_general_dilated(
            x.astype(dt),
            params["patch_embed"]["w"].astype(dt),
            window_strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        ) + params["patch_embed"]["b"].astype(dt)
        tokens = tokens.reshape(b, gh * gw, c.width)

        cls = jnp.broadcast_to(params["cls_token"].astype(dt), (b, 1, c.width))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + _resize_pos_embed(params["pos_embed"], c, gh, gw).astype(dt)

        fused, interpret = _resolve_attention(c)
        tanh_gelu = _resolve_gelu(c)
        for blk in params["blocks"]:
            tokens = _block(tokens, blk, c, dt, attn_fused=fused, interpret=interpret,
                            tanh_gelu=tanh_gelu)

        out = _layer_norm(tokens[:, 0, :], params["norm"], c.ln_eps)
        return out.astype(jnp.float32)

    def preprocess(self, tiles: jax.Array, mean=None, std=None) -> jax.Array:
        from toad_tpu.models.resnet_encoder import IMAGENET_MEAN, IMAGENET_STD

        x = tiles.astype(jnp.float32) / 255.0
        mean = IMAGENET_MEAN if mean is None else np.asarray(mean, np.float32)
        std = IMAGENET_STD if std is None else np.asarray(std, np.float32)
        return (x - jnp.asarray(mean)) / jnp.asarray(std)

    def embed(self, params: Params, tiles: jax.Array) -> jax.Array:
        return self.apply(params, self.preprocess(tiles))

    def param_count(self, params: Params) -> int:
        from toad_tpu.utils import param_count

        return param_count(params)


def _layer_norm(x, ln, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]


def _resolve_attention(c: ViTConfig) -> tuple[bool, bool]:
    """(use_fused_kernel, interpret) from the config + active backend."""
    if c.attention not in ("auto", "fused", "xla"):
        raise ValueError(f"ViTConfig.attention must be auto|fused|xla, got {c.attention!r}")
    on_tpu = jax.default_backend() == "tpu"
    if c.attention == "xla" or (c.attention == "auto" and not on_tpu):
        return False, False
    return True, not on_tpu


def _resolve_gelu(c: ViTConfig) -> bool:
    """True = tanh-approximate GELU (see ViTConfig.gelu)."""
    if c.gelu not in ("auto", "exact", "tanh"):
        raise ValueError(f"ViTConfig.gelu must be auto|exact|tanh, got {c.gelu!r}")
    if c.gelu == "auto":
        return jnp.dtype(c.compute_dtype) == jnp.bfloat16
    return c.gelu == "tanh"


def _block(x, blk, c: ViTConfig, dt, attn_fused: bool = False, interpret: bool = False,
           tanh_gelu: bool = False):
    h = _layer_norm(x, blk["norm1"], c.ln_eps).astype(dt)
    qkv = h @ blk["qkv"]["w"].astype(dt) + blk["qkv"]["b"].astype(dt)
    b, n, _ = qkv.shape
    if attn_fused:
        from toad_tpu.ops.vit_attention import fused_mha

        o = fused_mha(qkv, c.heads, c.head_dim, interpret=interpret)
    else:
        qkv = qkv.reshape(b, n, 3, c.heads, c.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, Dh]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c.head_dim**-0.5), axis=-1).astype(dt)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v, preferred_element_type=dt).reshape(b, n, c.width)
    o = o @ blk["proj"]["w"].astype(dt) + blk["proj"]["b"].astype(dt)
    if "ls1" in blk:
        o = o * blk["ls1"].astype(dt)
    x = x + o

    h = _layer_norm(x, blk["norm2"], c.ln_eps).astype(dt)
    h = jax.nn.gelu(h @ blk["fc1"]["w"].astype(dt) + blk["fc1"]["b"].astype(dt), approximate=tanh_gelu)
    h = h @ blk["fc2"]["w"].astype(dt) + blk["fc2"]["b"].astype(dt)
    if "ls2" in blk:
        h = h * blk["ls2"].astype(dt)
    return x + h


def _resize_pos_embed(pos: jax.Array, c: ViTConfig, gh: int, gw: int) -> jax.Array:
    """Bicubic grid resize of the stored pos_embed to the tile's grid
    (timm ``dynamic_img_size``); cls position passes through."""
    n0 = c.pretrain_img_size // c.patch_size
    cls_pos, grid = pos[:, :1, :], pos[:, 1:, :]
    if (gh, gw) == (n0, n0):
        return pos
    grid = grid.reshape(1, n0, n0, c.width).astype(jnp.float32)
    grid = jax.image.resize(grid, (1, gh, gw, c.width), method="cubic")
    return jnp.concatenate([cls_pos, grid.reshape(1, gh * gw, c.width).astype(pos.dtype)], axis=1)


# ---------------------------------------------------------------------------
# timm-layout weight ingestion (UNI ships as a timm ViT state_dict)
# ---------------------------------------------------------------------------


def _lin(sd, name):
    return {
        "w": jnp.asarray(np.ascontiguousarray(np.asarray(sd[f"{name}.weight"], np.float32).T)),
        "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
    }


def _ln(sd, name):
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
    }


def params_from_timm_state_dict(
    sd: Mapping[str, Any], config: ViTConfig | None = None, heads: int | None = None
) -> tuple[Params, ViTConfig]:
    """timm ViT state_dict -> params. Infers depth/width/layerscale from the
    keys when `config` is None; the head count is NOT stored in a state_dict,
    so it defaults to head_dim=64 (correct for ViT-S/B/L/H and UNI) and must
    be passed explicitly for other geometries. Ignores classifier heads
    (num_classes=0 for UNI anyway)."""
    sd = {k.removeprefix("module.").removeprefix("model."): v for k, v in sd.items()}
    width = int(np.asarray(sd["cls_token"]).shape[-1])
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    layerscale = "blocks.0.ls1.gamma" in sd or "blocks.0.gamma_1" in sd
    pe = np.asarray(sd["patch_embed.proj.weight"], np.float32)  # [D, 3, P, P]
    patch = pe.shape[-1]
    n_pos = int(np.asarray(sd["pos_embed"]).shape[1]) - 1
    grid = int(round(float(np.sqrt(n_pos))))
    if config is None:
        if heads is None:
            if width % 64 != 0:
                raise ValueError(
                    f"cannot infer head count for width {width} (not a multiple of 64); "
                    "pass heads= explicitly"
                )
            heads = width // 64
        config = ViTConfig(
            patch_size=patch,
            width=width,
            depth=depth,
            heads=heads,
            pretrain_img_size=grid * patch,
            layerscale=layerscale,
        )
    params: Params = {
        "patch_embed": {
            "w": jnp.asarray(np.ascontiguousarray(pe.transpose(2, 3, 1, 0))),
            "b": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"], np.float32)),
        },
        "cls_token": jnp.asarray(np.asarray(sd["cls_token"], np.float32)),
        "pos_embed": jnp.asarray(np.asarray(sd["pos_embed"], np.float32)),
        "norm": _ln(sd, "norm"),
        "blocks": [],
    }
    for i in range(depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "qkv": _lin(sd, f"{p}.attn.qkv"),
            "proj": _lin(sd, f"{p}.attn.proj"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "fc1": _lin(sd, f"{p}.mlp.fc1"),
            "fc2": _lin(sd, f"{p}.mlp.fc2"),
        }
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = jnp.asarray(np.asarray(sd[f"{p}.ls1.gamma"], np.float32))
            blk["ls2"] = jnp.asarray(np.asarray(sd[f"{p}.ls2.gamma"], np.float32))
        elif f"{p}.gamma_1" in sd:  # older DINO naming
            blk["ls1"] = jnp.asarray(np.asarray(sd[f"{p}.gamma_1"], np.float32))
            blk["ls2"] = jnp.asarray(np.asarray(sd[f"{p}.gamma_2"], np.float32))
        params["blocks"].append(blk)
    return params, config


def load_timm_weights(
    path: str | os.PathLike, config: ViTConfig | None = None, heads: int | None = None
) -> tuple[Params, ViTConfig]:
    """Load a timm ViT checkpoint file (e.g. UNI's ``pytorch_model.bin``)."""
    from toad_tpu.data.torch_io import load_torch_pickle

    sd = load_torch_pickle(path)
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state_dict")
    for key in ("state_dict", "model", "teacher"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    return params_from_timm_state_dict(sd, config, heads=heads)


def make_vit_embedder(config: ViTConfig, params: Params):
    """(params, jitted embed(tiles_uint8) -> [B, width]) like
    :func:`toad_tpu.models.resnet_encoder.make_embedder`.

    Params are jit ARGUMENTS, not closure captures — captured arrays bake
    into the program as constants (1.2GB for ViT-L), which remote compile
    services cannot survive. embed_fn therefore takes (params, tiles)."""
    enc = ViTEncoder(config)

    @jax.jit
    def embed_fn(params: Params, tiles: jax.Array) -> jax.Array:
        return enc.embed(params, tiles)

    return params, embed_fn
