"""Omnidata DPT-hybrid monocular depth network in Flax.

Reference: thirdparty/mono_priors/omnidata/modules/midas/{dpt_depth.py,
vit.py, blocks.py} — backbone "vitb_rn50_384": a ResNetV2-50 stem
(weight-standardized convs + GroupNorm, timm BiT-style) feeding a ViT-B/16
with project-readout, hooks [stage0, stage1, block8, block11], RefineNet
fusion decoder, and a depth head. Channel-last throughout.

The omnidata checkpoint (`omnidata_dpt_depth_v2.ckpt`) does not ship in
this environment; `DPTDepthPredictor` loads + converts it when present
and raises a clear error otherwise. Structure matches the torch module
tree so the converter is a name-mapping exercise.

Prediction protocol mirrors src/mono_estimators.py:49-73: resize to 512²,
normalize (0.5, 0.5), forward, clamp to [0, 1], resize back.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# ResNetV2 stem (timm BiT): weight-standardized conv + GroupNorm(32)
# ---------------------------------------------------------------------------

class WSConv(nn.Conv):
    """Conv with standardized weights (timm StdConv2dSame equivalent:
    per-output-channel standardization applied at forward time, so raw
    checkpoint weights load directly)."""

    def param(self, name, init_fn, *args):
        p = super().param(name, init_fn, *args)
        if name == "kernel":
            mean = p.mean(axis=(0, 1, 2), keepdims=True)
            var = p.var(axis=(0, 1, 2), keepdims=True)
            p = (p - mean) * jax.lax.rsqrt(var + 1e-6)
        return p


def _same_pad(k: int, s: int):
    """TF-'SAME' padding for even input sizes (timm *Same layers):
    (7, 2) → (2, 3); (3, 2) → (0, 1); stride 1 → symmetric k//2."""
    if s == 1:
        return ((k // 2, k // 2),) * 2
    total = max(k - s, 0)
    lo = total // 2
    return ((lo, total - lo),) * 2


class Bottleneck(nn.Module):
    """ResNetV2 non-preact bottleneck — timm's vit_base_r50_s16_384
    backbone uses ResNetV2(preact=False): conv→GroupNorm(+relu) ×3 with a
    conv+norm downsample shortcut and a final relu after the add."""
    mid: int
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out:
            s = WSConv(self.out, (1, 1), strides=self.stride,
                       use_bias=False, name="downsample_conv")(x)
            shortcut = nn.GroupNorm(32, epsilon=1e-5, name="downsample_norm")(s)
        y = WSConv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(nn.GroupNorm(32, epsilon=1e-5, name="norm1")(y))
        y = WSConv(self.mid, (3, 3), strides=self.stride,
                   padding=_same_pad(3, self.stride),
                   use_bias=False, name="conv2")(y)
        y = nn.relu(nn.GroupNorm(32, epsilon=1e-5, name="norm2")(y))
        y = WSConv(self.out, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.GroupNorm(32, epsilon=1e-5, name="norm3")(y)
        return nn.relu(y + shortcut)


RESNET_DEPTHS = (3, 4, 9)


class ResNetV2Stem(nn.Module):
    """Stem + 3 stages of ResNetV2-50 as used by vit_base_r50_s16_384
    (depths (3, 4, 9), output stride 16). Returns stage0 (/4, 256ch),
    stage1 (/8, 512ch) activations and the final /16 feature."""

    @nn.compact
    def __call__(self, x):
        x = WSConv(64, (7, 7), strides=2, padding=_same_pad(7, 2),
                   use_bias=False, name="stem_conv")(x)
        x = nn.relu(nn.GroupNorm(32, epsilon=1e-5, name="stem_norm")(x))
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                    constant_values=-jnp.inf)     # maxpool 'same' k3 s2
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # stage 0: 3 blocks, 256 out
        for i in range(RESNET_DEPTHS[0]):
            x = Bottleneck(64, 256, name=f"s0_b{i}")(x)
        act1 = x
        # stage 1: 4 blocks, 512 out, stride 2
        for i in range(RESNET_DEPTHS[1]):
            x = Bottleneck(128, 512, stride=2 if i == 0 else 1,
                           name=f"s1_b{i}")(x)
        act2 = x
        # stage 2: 9 blocks, 1024 out, stride 2
        for i in range(RESNET_DEPTHS[2]):
            x = Bottleneck(256, 1024, stride=2 if i == 0 else 1,
                           name=f"s2_b{i}")(x)
        return act1, act2, x


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

class MHA(nn.Module):
    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(
            B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(D // self.heads)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int = 768
    mlp: int = 3072
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + MHA(self.dim, self.heads, name="attn")(y)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.mlp, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


# ---------------------------------------------------------------------------
# DPT decoder
# ---------------------------------------------------------------------------

def _resize2x(x):
    """2× bilinear upsample with align_corners=True (the reference's
    FeatureFusionBlock and head both use align_corners=True —
    blocks.py:340-342, dpt_depth.py:98 — which jax.image.resize does not
    offer). Separable gather-interpolate."""
    B, H, W, C = x.shape
    Ho, Wo = 2 * H, 2 * W

    def axis_interp(a, n_in, n_out, axis):
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w = (pos - lo).astype(a.dtype)
        sh = [1] * a.ndim
        sh[axis] = n_out
        w = w.reshape(sh)
        return (jnp.take(a, lo, axis=axis) * (1 - w)
                + jnp.take(a, hi, axis=axis) * w)

    x = axis_interp(x, H, Ho, 1)
    return axis_interp(x, W, Wo, 2)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """FeatureFusionBlock_custom (blocks.py:296-): optional skip through
    res1, then res2, 2× bilinear upsample, 1×1 out conv."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="res1")(skip)
        x = ResidualConvUnit(self.features, name="res2")(x)
        x = _resize2x(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTDepthModel(nn.Module):
    """vitb_rn50_384 DPT depth net, channel-last, square inputs."""
    features: int = 256
    vit_dim: int = 768
    num_blocks: int = 12
    patch_grid: int = 24      # checkpoint-native grid (384/16); resized
                              # to the runtime grid like forward_flex

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // 16, W // 16

        act1, act2, feat = ResNetV2Stem(name="backbone")(x)

        # patch embed projection + tokens
        tokens = nn.Conv(self.vit_dim, (1, 1), name="patch_proj")(feat)
        tokens = tokens.reshape(B, gh * gw, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.patch_grid ** 2 + 1, self.vit_dim))
        # resize positional grid to (gh, gw) like forward_flex (vit.py)
        pos_cls = pos[:, :1]
        pos_grid = pos[:, 1:].reshape(1, self.patch_grid, self.patch_grid,
                                      self.vit_dim)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, self.vit_dim),
                                    "bilinear").reshape(1, gh * gw,
                                                        self.vit_dim)
        tokens = tokens + pos_grid
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls + pos_cls, (B, 1, self.vit_dim)), tokens], 1)

        # hooks capture RAW block outputs — the reference's forward hooks
        # fire before model.norm, so the final LayerNorm is never applied
        # to the DPT branch (vit.py:66-75)
        hooks = {}
        for i in range(self.num_blocks):
            tokens = ViTBlock(name=f"block{i}")(tokens)
            if i in (8, 11):
                hooks[i] = tokens

        def readout(tok, name):
            """ProjectReadout: concat cls token, linear project, GELU."""
            cls_t = tok[:, :1]
            spatial = tok[:, 1:]
            cat = jnp.concatenate(
                [spatial, jnp.broadcast_to(cls_t, spatial.shape)], -1)
            out = nn.Dense(self.vit_dim, name=f"{name}_proj")(cat)
            out = nn.gelu(out, approximate=False)
            return out.reshape(B, gh, gw, self.vit_dim)

        l3 = readout(hooks[8], "readout3")
        l3 = nn.Conv(self.features * 3 // 2, (1, 1), name="post3")(l3)  # 384
        l4 = readout(hooks[11], "readout4")
        l4 = nn.Conv(self.vit_dim, (1, 1), name="post4a")(l4)
        l4 = nn.Conv(self.vit_dim, (3, 3), strides=2, padding=1,
                     name="post4b")(l4)

        r1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer1_rn")(act1)
        r2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer2_rn")(act2)
        r3 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer3_rn")(l3)
        r4 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="layer4_rn")(l4)

        p4 = FeatureFusionBlock(self.features, name="refinenet4")(r4)
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(p4, r3)
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(p3, r2)
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, r1)

        h = nn.Conv(self.features // 2, (3, 3), padding=1, name="head0")(p1)
        h = _resize2x(h)
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, name="head2")(h))
        h = nn.relu(nn.Conv(1, (1, 1), name="head4")(h))
        return h[..., 0]


class DPTDepthPredictor:
    """Prediction wrapper (mono_estimators.py:49-73 protocol)."""

    def __init__(self, ckpt_path: str | None = None, size: int = 512):
        self.size = size
        self.model = DPTDepthModel()
        if ckpt_path:
            import os
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(
                    f"omnidata checkpoint not found: {ckpt_path} — "
                    "download omnidata_dpt_depth_v2.ckpt or use "
                    "mono_prior.provider: files/oracle")
            self.params = load_omnidata_params(ckpt_path)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, size, size, 3)))["params"]
        self._fwd = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, image: np.ndarray) -> np.ndarray:
        H, W = image.shape[:2]
        x = jax.image.resize(jnp.asarray(image), (self.size, self.size, 3),
                             "bilinear")
        x = (x - 0.5) / 0.5
        d = self._fwd(self.params, x[None])[0]
        d = jnp.clip(d, 0.0, 1.0)
        d = jax.image.resize(d, (H, W), "bicubic")
        return np.asarray(d)


def convert_state_dict(sd: dict) -> dict:
    """Deterministic torch→Flax name/layout mapping for the omnidata
    DPT-hybrid checkpoint (keys as produced by mono_estimators.py:36-43
    after the 'model.' prefix strip: `pretrained.*` + `scratch.*`, timm
    vit_base_r50_s16_384 naming).

    Accepts any mapping of key → array-like (torch tensors or numpy), so
    it is unit-testable with a synthetic state dict of the right shapes.
    """
    def g(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def conv(k):
        out = {"kernel": g(k + ".weight").transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            out["bias"] = g(k + ".bias")
        return out

    def norm(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias")}

    def dense(k):
        return {"kernel": g(k + ".weight").T, "bias": g(k + ".bias")}

    BB = "pretrained.model.patch_embed.backbone"
    bb = {"stem_conv": conv(f"{BB}.stem.conv"),
          "stem_norm": norm(f"{BB}.stem.norm")}
    for s, depth in enumerate(RESNET_DEPTHS):
        for b in range(depth):
            p = f"{BB}.stages.{s}.blocks.{b}"
            blk = {"conv1": conv(p + ".conv1"), "norm1": norm(p + ".norm1"),
                   "conv2": conv(p + ".conv2"), "norm2": norm(p + ".norm2"),
                   "conv3": conv(p + ".conv3"), "norm3": norm(p + ".norm3")}
            if p + ".downsample.conv.weight" in sd:
                blk["downsample_conv"] = conv(p + ".downsample.conv")
                blk["downsample_norm"] = norm(p + ".downsample.norm")
            bb[f"s{s}_b{b}"] = blk

    params = {
        "backbone": bb,
        "patch_proj": conv("pretrained.model.patch_embed.proj"),
        "cls_token": g("pretrained.model.cls_token"),
        "pos_embed": g("pretrained.model.pos_embed"),
        # readout projections + post convs (act_postprocess3/4, vit.py)
        "readout3_proj": dense("pretrained.act_postprocess3.0.project.0"),
        "post3": conv("pretrained.act_postprocess3.3"),
        "readout4_proj": dense("pretrained.act_postprocess4.0.project.0"),
        "post4a": conv("pretrained.act_postprocess4.3"),
        "post4b": conv("pretrained.act_postprocess4.4"),
        "head0": conv("scratch.output_conv.0"),
        "head2": conv("scratch.output_conv.2"),
        "head4": conv("scratch.output_conv.4"),
    }
    for i in range(12):
        p = f"pretrained.model.blocks.{i}"
        params[f"block{i}"] = {
            "norm1": norm(p + ".norm1"),
            "attn": {"qkv": dense(p + ".attn.qkv"),
                     "proj": dense(p + ".attn.proj")},
            "norm2": norm(p + ".norm2"),
            "fc1": dense(p + ".mlp.fc1"),
            "fc2": dense(p + ".mlp.fc2"),
        }
    for i in (1, 2, 3, 4):
        params[f"layer{i}_rn"] = conv(f"scratch.layer{i}_rn")
        rp = f"scratch.refinenet{i}"
        rf = {"res2": {"conv1": conv(rp + ".resConfUnit2.conv1"),
                       "conv2": conv(rp + ".resConfUnit2.conv2")},
              "out_conv": conv(rp + ".out_conv")}
        if i != 4:
            # refinenet4 takes a single input: its resConfUnit1 exists in
            # the checkpoint but is never executed (blocks.py:331-338)
            rf["res1"] = {"conv1": conv(rp + ".resConfUnit1.conv1"),
                          "conv2": conv(rp + ".resConfUnit1.conv2")}
        params[f"refinenet{i}"] = rf
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_omnidata_params(path: str):
    """Load + convert the torch omnidata checkpoint
    (omnidata_dpt_depth_v2.ckpt) to this module's params."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    # strip the lightning 'model.' prefix (mono_estimators.py:38-40)
    if any(k.startswith("model.") for k in sd):
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
    return convert_state_dict(sd)
