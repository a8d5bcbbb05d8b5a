"""Truncated ResNet-50 patch encoder — TPU-native JAX implementation.

Capability parity with the reference's vendored encoder
(``models/resnet_custom.py:19-124``): stem (7x7/2 conv + BN + ReLU + 3x3/2
maxpool), bottleneck stages layer1 (3 blocks), layer2 (4, /2), layer3 (6, /2),
**no layer4 / no fc**, global average pool -> 1024-d per tile
(``resnet_custom.py:62-70,96-109``). The encoder is the feature extractor the
TOAD pipeline delegates to CLAM for (``docs/README.md:24,39``); here it is a
first-class stage so tiles -> bags runs end-to-end on TPU.

TPU-first choices:
- NHWC activations / HWIO kernels (XLA's native conv layout on TPU).
- bfloat16 compute with float32 params and float32 BN statistics.
- Inference-mode BatchNorm folded into the preceding conv (one fused
  conv+bias per layer — removes an entire HBM-bound elementwise pass per BN).
  The encoder is frozen in this pipeline (ImageNet weights, reference
  ``resnet_custom.py:111-119``), so no train-mode BN is needed.
- Weight ingestion from torchvision ``resnet50`` state_dicts via the native
  torch-zip parser (:mod:`toad_tpu.data.torch_io`) — extra ``layer4``/``fc``
  keys are ignored, mirroring the reference's ``strict=False`` load
  (``resnet_custom.py:121-124``).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from toad_tpu.config import EncoderConfig

Params = dict[str, Any]

# torchvision/ImageNet preprocessing constants (the contract CLAM feeds the
# reference encoder with).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# Init (Kaiming fan-out for convs, BN gamma=1/beta=0 — matches the
# reference's from-scratch init at resnet_custom.py:72-77)
# ---------------------------------------------------------------------------


def _kaiming_conv(key, kh, kw, cin, cout, dtype):
    fan_out = kh * kw * cout
    std = float(np.sqrt(2.0 / fan_out))
    return (jax.random.normal(key, (kh, kw, cin, cout)) * std).astype(dtype)


def _bn_init(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


class ResNetEncoder:
    """init/apply container for the truncated ResNet-50 (pure functions)."""

    def __init__(self, config: EncoderConfig = EncoderConfig()):
        self.config = config
        self._init_jit = None

    def init(self, key: jax.Array) -> Params:
        """One jitted program (see ViTEncoder.init for why); wrapper cached
        so repeated init() calls hit the jit cache."""
        if self._init_jit is None:
            self._init_jit = jax.jit(self._init_impl)
        return self._init_jit(key)

    def _init_impl(self, key: jax.Array) -> Params:
        c = self.config
        dtype = jnp.dtype(c.param_dtype)
        n_stages = len(c.blocks)
        keys = iter(jax.random.split(key, 4 + 4 * sum(c.blocks) + n_stages))
        params: Params = {
            "stem": {"conv": _kaiming_conv(next(keys), 7, 7, 3, c.stem_width, dtype), "bn": _bn_init(c.stem_width)}
        }
        cin = c.stem_width
        for s, (n_blocks, width) in enumerate(zip(c.blocks, c.stage_widths)):
            blocks = []
            cout = width * c.expansion
            for b in range(n_blocks):
                blk = {
                    "conv1": _kaiming_conv(next(keys), 1, 1, cin, width, dtype),
                    "bn1": _bn_init(width),
                    "conv2": _kaiming_conv(next(keys), 3, 3, width, width, dtype),
                    "bn2": _bn_init(width),
                    "conv3": _kaiming_conv(next(keys), 1, 1, width, cout, dtype),
                    "bn3": _bn_init(cout),
                }
                if b == 0 and (cin != cout or s > 0):
                    blk["downsample"] = {
                        "conv": _kaiming_conv(next(keys), 1, 1, cin, cout, dtype),
                        "bn": _bn_init(cout),
                    }
                blocks.append(blk)
                cin = cout
            params[f"layer{s + 1}"] = blocks
        return params

    # -- forward ----------------------------------------------------------------

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        """Normalized float tiles [B, H, W, 3] -> features [B, out_dim]."""
        c = self.config
        dt = jnp.dtype(c.compute_dtype)
        x = x.astype(dt)

        if c.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _stem_conv_s2d(x, params["stem"]["conv"], dt)
        else:
            x = _conv(x, params["stem"]["conv"], stride=2, padding=3, dt=dt)
        x = _bn_relu(x, params["stem"]["bn"], c.bn_eps)
        x = _max_pool_3x3_s2(x)

        for s, n_blocks in enumerate(c.blocks):
            stage = params[f"layer{s + 1}"]
            stride = 1 if s == 0 else 2
            for b in range(n_blocks):
                x = _bottleneck(x, stage[b], stride if b == 0 else 1, c.bn_eps, dt)

        # global average pool (reference AdaptiveAvgPool2d(1), :70,105)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    def preprocess(self, tiles: jax.Array) -> jax.Array:
        """uint8 RGB tiles [B, H, W, 3] -> ImageNet-normalized float."""
        x = tiles.astype(jnp.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def embed(self, params: Params, tiles: jax.Array) -> jax.Array:
        """uint8 tiles -> [B, out_dim] features (normalize + forward)."""
        return self.apply(params, self.preprocess(tiles))

    def param_count(self, params: Params) -> int:
        from toad_tpu.utils import param_count

        return param_count(params)


# ---------------------------------------------------------------------------
# Layer primitives
# ---------------------------------------------------------------------------


def _conv(x, w, stride=1, padding=0, dt=jnp.bfloat16, bias=None):
    out = jax.lax.conv_general_dilated(
        x.astype(dt),
        w.astype(dt),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
    )
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def _space_to_depth2(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _stem_s2d_weights(w):
    """Rearrange a [7,7,Cin,Cout] stride-2 stem kernel into the equivalent
    [4,4,4*Cin,Cout] stride-1 kernel over space-to-depth(2) input.

    Derivation: output (i,j) of the stride-2 pad-3 conv reads input rows
    u = 2i+p-3 (p in 0..6). Writing u = 2a+dy over 2x2 blocks gives block
    offsets t = a-i+2 in 0..3 with tap p = 2t+dy-1 — i.e. a 4x4 conv with
    padding (2,1), whose weights are the original taps scattered by parity
    (the p=-1 slot is zero). Exact, not an approximation."""
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"s2d stem expects a 7x7 kernel, got {(kh, kw)}")
    wpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # tap index p+1 = 2t+dy
    wr = wpad.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return wr.reshape(4, 4, 4 * cin, cout)


def _stem_conv_s2d(x, w, dt, bias=None):
    """Space-to-depth stem: exact replacement for conv7x7/2 pad 3."""
    x2 = _space_to_depth2(x.astype(dt))
    out = jax.lax.conv_general_dilated(
        x2,
        _stem_s2d_weights(w).astype(dt),
        window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
    )
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def _bn_relu(x, bn, eps, relu=True):
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    shift = bn["bias"] - bn["mean"] * scale
    out = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return jax.nn.relu(out) if relu else out


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _bottleneck(x, blk, stride, eps, dt):
    """conv1x1-BN-relu -> conv3x3(stride)-BN-relu -> conv1x1-BN + skip, relu
    (reference Bottleneck_Baseline, resnet_custom.py:19-49; folded variants
    carry 'bias' entries instead of 'bnX')."""
    folded = "bn1" not in blk
    if folded:
        out = _conv(x, blk["conv1"], dt=dt, bias=blk["bias1"])
        out = jax.nn.relu(out)
        out = _conv(out, blk["conv2"], stride=stride, padding=1, dt=dt, bias=blk["bias2"])
        out = jax.nn.relu(out)
        out = _conv(out, blk["conv3"], dt=dt, bias=blk["bias3"])
        if "downsample" in blk:
            sc = _conv(x, blk["downsample"]["conv"], stride=stride, dt=dt, bias=blk["downsample"]["bias"])
        else:
            sc = x
    else:
        out = _bn_relu(_conv(x, blk["conv1"], dt=dt), blk["bn1"], eps)
        out = _bn_relu(_conv(out, blk["conv2"], stride=stride, padding=1, dt=dt), blk["bn2"], eps)
        out = _bn_relu(_conv(out, blk["conv3"], dt=dt), blk["bn3"], eps, relu=False)
        if "downsample" in blk:
            sc = _bn_relu(_conv(x, blk["downsample"]["conv"], stride=stride, dt=dt), blk["downsample"]["bn"], eps, relu=False)
        else:
            sc = x
    return jax.nn.relu(out + sc)


# ---------------------------------------------------------------------------
# BN folding — inference-only speed: w' = w * s, b' = beta - mean * s
# (s = gamma / sqrt(var + eps)), one fused conv+bias per layer.
# ---------------------------------------------------------------------------


def _fold(conv_w: jax.Array, bn: Mapping[str, jax.Array], eps: float):
    s = np.asarray(bn["scale"]) / np.sqrt(np.asarray(bn["var"]) + eps)
    w = np.asarray(conv_w) * s[None, None, None, :]
    b = np.asarray(bn["bias"]) - np.asarray(bn["mean"]) * s
    return jnp.asarray(w), jnp.asarray(b.astype(np.float32))


def fold_bn(params: Params, config: EncoderConfig = EncoderConfig()) -> Params:
    """Fold all inference BNs into their convs. Stem keeps its BN separate
    only in name: it also becomes conv+bias."""
    eps = config.bn_eps
    out: Params = {}
    if "bn" in params["stem"]:
        w, b = _fold(params["stem"]["conv"], params["stem"]["bn"], eps)
        out["stem"] = {"conv": w, "bias": b}
    else:  # already folded — idempotent, like the block-level guard below
        out["stem"] = params["stem"]
    for s in range(len(config.blocks)):
        blocks = []
        for blk in params[f"layer{s + 1}"]:
            if "bn1" not in blk:  # already folded
                blocks.append(blk)
                continue
            nb: dict[str, Any] = {}
            for i in (1, 2, 3):
                nb[f"conv{i}"], nb[f"bias{i}"] = _fold(blk[f"conv{i}"], blk[f"bn{i}"], eps)
            if "downsample" in blk:
                dw, db = _fold(blk["downsample"]["conv"], blk["downsample"]["bn"], eps)
                nb["downsample"] = {"conv": dw, "bias": db}
            blocks.append(nb)
        out[f"layer{s + 1}"] = blocks
    return out


def apply_folded(config: EncoderConfig, params: Params, x: jax.Array) -> jax.Array:
    """Forward through BN-folded params (normalized tiles -> features)."""
    dt = jnp.dtype(config.compute_dtype)
    if config.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = _stem_conv_s2d(x, params["stem"]["conv"], dt, bias=params["stem"]["bias"])
    else:
        x = _conv(x.astype(dt), params["stem"]["conv"], stride=2, padding=3, dt=dt, bias=params["stem"]["bias"])
    x = jax.nn.relu(x)
    x = _max_pool_3x3_s2(x)
    for s, n_blocks in enumerate(config.blocks):
        stage = params[f"layer{s + 1}"]
        stride = 1 if s == 0 else 2
        for b in range(n_blocks):
            x = _bottleneck(x, stage[b], stride if b == 0 else 1, config.bn_eps, dt)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision weight ingestion
# ---------------------------------------------------------------------------


def _t_conv(sd: Mapping[str, np.ndarray], name: str) -> jnp.ndarray:
    # torch OIHW -> jax HWIO
    return jnp.asarray(np.ascontiguousarray(np.asarray(sd[name], np.float32).transpose(2, 3, 1, 0)))


def _t_bn(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"], np.float32)),
        "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"], np.float32)),
    }


def params_from_torchvision_state_dict(
    sd: Mapping[str, Any], config: EncoderConfig = EncoderConfig()
) -> Params:
    """torchvision ``resnet50`` state_dict -> truncated encoder params.

    ``layer4.*`` / ``fc.*`` keys (and any others) are simply never read —
    the reference's ``strict=False`` truncation (resnet_custom.py:121-124).
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params: Params = {"stem": {"conv": _t_conv(sd, "conv1.weight"), "bn": _t_bn(sd, "bn1")}}
    for s, n_blocks in enumerate(config.blocks):
        layer = f"layer{s + 1}"
        blocks = []
        for b in range(n_blocks):
            p = f"{layer}.{b}"
            blk: dict[str, Any] = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = _t_conv(sd, f"{p}.conv{i}.weight")
                blk[f"bn{i}"] = _t_bn(sd, f"{p}.bn{i}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _t_conv(sd, f"{p}.downsample.0.weight"),
                    "bn": _t_bn(sd, f"{p}.downsample.1"),
                }
            blocks.append(blk)
        params[layer] = blocks
    return params


def load_torchvision_weights(path: str | os.PathLike, config: EncoderConfig = EncoderConfig()) -> Params:
    """Load a torchvision ``resnet50-*.pth`` file (no torch needed)."""
    from toad_tpu.data.torch_io import load_torch_pickle

    sd = load_torch_pickle(path)
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state_dict")
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return params_from_torchvision_state_dict(sd, config)


def make_embedder(config: EncoderConfig, params: Params):
    """Return (folded_params, jitted embed_fn(params, tiles_uint8) -> [B, out_dim]).

    The hot path for featurization: BN pre-folded on host, one jitted
    program per tile shape, bf16 convs on the MXU, fp32 accumulated GAP.
    Params are a jit ARGUMENT (closure capture would bake them into the
    program as constants), so callers may re-shard/replace them per call.
    """
    enc = ResNetEncoder(config)
    fp = fold_bn(params, config) if config.fold_bn else params

    @jax.jit
    def embed_fn(fp, tiles: jax.Array) -> jax.Array:
        x = enc.preprocess(tiles)
        if config.fold_bn:
            return apply_folded(config, fp, x)
        return enc.apply(fp, x)

    return fp, embed_fn
