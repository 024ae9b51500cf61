"""Golden-parity tests for the omnidata DPT-hybrid net (models/dpt.py).

No omnidata checkpoint ships in this environment, so parity is
established in three layers (VERDICT r2 item 5):

  1. block-level goldens: independently-written torch-op reference
     forwards (F.conv2d / F.group_norm / F.layer_norm / F.interpolate
     with align_corners=True — the exact ops the reference modules use,
     thirdparty/mono_priors/omnidata/modules/midas/{vit.py,blocks.py})
     vs the Flax modules, with a shared random torch-layout state dict
     run through `convert_state_dict`'s mapping conventions;
  2. converter coverage: a full synthetic torch-layout omnidata state
     dict converts into EXACTLY the tree (paths + shapes) that
     DPTDepthModel.init produces — a missing/renamed/mis-shaped key
     fails loudly;
  3. e2e plumbing: torch.save the synthetic checkpoint (lightning
     'model.' prefix and all), run the real provider="dpt" loading path
     (load_omnidata_params -> DPTDepthPredictor.__call__) and check a
     finite, correctly-shaped depth map.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from splatslam_tpu.models import dpt as D

RNG = np.random.default_rng(11)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def rnd(*shape, scale=0.2):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# torch-op reference forwards (written from the architecture spec)
# ---------------------------------------------------------------------------

def ref_stdconv(x, w, stride=1, pad=(0, 0), bias=None):
    """timm StdConv2dSame: standardize weights over (in, kh, kw) per out
    channel (biased var, eps 1e-6), then plain conv. x NCHW, w OIHW;
    pad = (lo, hi) applied to both spatial dims (TF-SAME style)."""
    var, mean = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                               unbiased=False)
    w = (w - mean) / torch.sqrt(var + 1e-6)
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    return F.conv2d(x, w, bias, stride=stride)


def ref_bottleneck(x, p, stride=1, has_down=False):
    """ResNetV2 (preact=False) bottleneck with GroupNorm(32, eps 1e-5)."""
    gn = lambda y, k: F.group_norm(y, 32, _t(p[k + ".weight"]),
                                   _t(p[k + ".bias"]), eps=1e-5)
    short = x
    if has_down:
        s = ref_stdconv(x, _t(p["downsample.conv.weight"]), stride=stride)
        short = gn(s, "downsample.norm")
    y = ref_stdconv(x, _t(p["conv1.weight"]))
    y = F.relu(gn(y, "norm1"))
    lo, hi = (1, 1) if stride == 1 else (0, 1)
    y = ref_stdconv(y, _t(p["conv2.weight"]), stride=stride, pad=(lo, hi))
    y = F.relu(gn(y, "norm2"))
    y = ref_stdconv(y, _t(p["conv3.weight"]))
    y = gn(y, "norm3")
    return F.relu(y + short)


def ref_vit_block(x, p, heads=4):
    """timm ViT block: LN(eps 1e-6) -> MHA -> +res -> LN -> MLP(gelu
    exact) -> +res. x (B, N, D) torch."""
    B, N, Dm = x.shape
    ln = lambda y, k: F.layer_norm(y, (Dm,), _t(p[k + ".weight"]),
                                   _t(p[k + ".bias"]), eps=1e-6)
    y = ln(x, "norm1")
    qkv = y @ _t(p["attn.qkv.weight"]).T + _t(p["attn.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, heads, Dm // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    att = torch.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(Dm // heads)
    att = torch.softmax(att, dim=-1)
    o = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, Dm)
    x = x + o @ _t(p["attn.proj.weight"]).T + _t(p["attn.proj.bias"])
    y = ln(x, "norm2")
    y = F.gelu(y @ _t(p["mlp.fc1.weight"]).T + _t(p["mlp.fc1.bias"]))
    return x + y @ _t(p["mlp.fc2.weight"]).T + _t(p["mlp.fc2.bias"])


def ref_fusion_block(x, skip, p):
    """FeatureFusionBlock_custom (blocks.py): optional skip through
    resConfUnit1, + resConfUnit2, interpolate(2x, bilinear,
    align_corners=True), 1x1 out conv."""
    def rcu(y, k):
        z = F.relu(y)
        z = F.conv2d(z, _t(p[k + ".conv1.weight"]),
                     _t(p[k + ".conv1.bias"]), padding=1)
        z = F.relu(z)
        z = F.conv2d(z, _t(p[k + ".conv2.weight"]),
                     _t(p[k + ".conv2.bias"]), padding=1)
        return y + z

    if skip is not None:
        x = x + rcu(skip, "resConfUnit1")
    x = rcu(x, "resConfUnit2")
    x = F.interpolate(x, scale_factor=2, mode="bilinear",
                      align_corners=True)
    return F.conv2d(x, _t(p["out_conv.weight"]), _t(p["out_conv.bias"]))


def nchw(x_nhwc):
    return torch.from_numpy(
        np.asarray(x_nhwc, np.float32).transpose(0, 3, 1, 2))


def nhwc(x_t):
    return x_t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# 1. block goldens
# ---------------------------------------------------------------------------

def test_bottleneck_golden():
    cin, mid, out, s = 64, 32, 64, 2
    p = {"conv1.weight": rnd(mid, cin, 1, 1),
         "norm1.weight": rnd(mid) + 1, "norm1.bias": rnd(mid),
         "conv2.weight": rnd(mid, mid, 3, 3),
         "norm2.weight": rnd(mid) + 1, "norm2.bias": rnd(mid),
         "conv3.weight": rnd(out, mid, 1, 1),
         "norm3.weight": rnd(out) + 1, "norm3.bias": rnd(out),
         "downsample.conv.weight": rnd(out, cin, 1, 1),
         "downsample.norm.weight": rnd(out) + 1,
         "downsample.norm.bias": rnd(out)}
    x = rnd(2, 8, 8, cin, scale=1.0)

    want = nhwc(ref_bottleneck(nchw(x), p, stride=s, has_down=True))

    conv = lambda k: {"kernel": p[k + ".weight"].transpose(2, 3, 1, 0)}
    norm = lambda k: {"scale": p[k + ".weight"], "bias": p[k + ".bias"]}
    fl = {"conv1": conv("conv1"), "norm1": norm("norm1"),
          "conv2": conv("conv2"), "norm2": norm("norm2"),
          "conv3": conv("conv3"), "norm3": norm("norm3"),
          "downsample_conv": conv("downsample.conv"),
          "downsample_norm": norm("downsample.norm")}
    got = D.Bottleneck(mid, out, stride=s).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, fl)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_stem_conv_same_padding_golden():
    """7x7 stride-2 stem conv with TF-SAME (2,3) padding on an even
    input — the padding convention timm's StdConv2dSame resolves to."""
    p = rnd(16, 3, 7, 7)
    x = rnd(1, 16, 16, 3, scale=1.0)
    want = nhwc(ref_stdconv(nchw(x), _t(p), stride=2, pad=(2, 3)))
    got = D.WSConv(16, (7, 7), strides=2, padding=D._same_pad(7, 2),
                   use_bias=False).apply(
        {"params": {"kernel": jnp.asarray(p.transpose(2, 3, 1, 0))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_vit_block_golden():
    Dm, heads, N = 64, 4, 10
    p = {"norm1.weight": rnd(Dm) + 1, "norm1.bias": rnd(Dm),
         "attn.qkv.weight": rnd(3 * Dm, Dm), "attn.qkv.bias": rnd(3 * Dm),
         "attn.proj.weight": rnd(Dm, Dm), "attn.proj.bias": rnd(Dm),
         "norm2.weight": rnd(Dm) + 1, "norm2.bias": rnd(Dm),
         "mlp.fc1.weight": rnd(2 * Dm, Dm), "mlp.fc1.bias": rnd(2 * Dm),
         "mlp.fc2.weight": rnd(Dm, 2 * Dm), "mlp.fc2.bias": rnd(Dm)}
    x = rnd(2, N, Dm, scale=1.0)

    want = ref_vit_block(_t(x), p, heads=heads).numpy()

    dense = lambda k: {"kernel": p[k + ".weight"].T,
                       "bias": p[k + ".bias"]}
    fl = {"norm1": {"scale": p["norm1.weight"], "bias": p["norm1.bias"]},
          "attn": {"qkv": dense("attn.qkv"), "proj": dense("attn.proj")},
          "norm2": {"scale": p["norm2.weight"], "bias": p["norm2.bias"]},
          "fc1": dense("mlp.fc1"), "fc2": dense("mlp.fc2")}
    got = D.ViTBlock(dim=Dm, mlp=2 * Dm, heads=heads).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, fl)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_fusion_block_golden():
    C = 32
    p = {}
    for u in ("resConfUnit1", "resConfUnit2"):
        p[u + ".conv1.weight"] = rnd(C, C, 3, 3)
        p[u + ".conv1.bias"] = rnd(C)
        p[u + ".conv2.weight"] = rnd(C, C, 3, 3)
        p[u + ".conv2.bias"] = rnd(C)
    p["out_conv.weight"] = rnd(C, C, 1, 1)
    p["out_conv.bias"] = rnd(C)
    x = rnd(1, 6, 6, C, scale=1.0)
    skip = rnd(1, 6, 6, C, scale=1.0)

    want = nhwc(ref_fusion_block(nchw(x), nchw(skip), p))

    conv = lambda k: {"kernel": p[k + ".weight"].transpose(2, 3, 1, 0),
                      "bias": p[k + ".bias"]}
    fl = {"res1": {"conv1": conv("resConfUnit1.conv1"),
                   "conv2": conv("resConfUnit1.conv2")},
          "res2": {"conv1": conv("resConfUnit2.conv1"),
                   "conv2": conv("resConfUnit2.conv2")},
          "out_conv": conv("out_conv")}
    got = D.FeatureFusionBlock(C).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, fl)},
        jnp.asarray(x), jnp.asarray(skip))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_resize2x_matches_torch_align_corners():
    x = rnd(1, 5, 7, 3, scale=1.0)
    want = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="bilinear",
                              align_corners=True))
    got = D._resize2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# 2/3. full synthetic checkpoint: converter coverage + e2e plumbing
# ---------------------------------------------------------------------------

def synthetic_omnidata_sd():
    """Every key of the omnidata vitb_rn50_384 checkpoint (post
    'model.'-strip naming) with correctly-shaped random values."""
    sd = {}
    BB = "pretrained.model.patch_embed.backbone"
    sd[f"{BB}.stem.conv.weight"] = rnd(64, 3, 7, 7)
    sd[f"{BB}.stem.norm.weight"] = rnd(64) + 1
    sd[f"{BB}.stem.norm.bias"] = rnd(64)
    chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024)]
    for s, depth in enumerate(D.RESNET_DEPTHS):
        cin, mid, out = chans[s]
        for b in range(depth):
            p = f"{BB}.stages.{s}.blocks.{b}"
            ci = cin if b == 0 else out
            sd[p + ".conv1.weight"] = rnd(mid, ci, 1, 1)
            sd[p + ".norm1.weight"] = rnd(mid) + 1
            sd[p + ".norm1.bias"] = rnd(mid)
            sd[p + ".conv2.weight"] = rnd(mid, mid, 3, 3)
            sd[p + ".norm2.weight"] = rnd(mid) + 1
            sd[p + ".norm2.bias"] = rnd(mid)
            sd[p + ".conv3.weight"] = rnd(out, mid, 1, 1)
            sd[p + ".norm3.weight"] = rnd(out) + 1
            sd[p + ".norm3.bias"] = rnd(out)
            if b == 0:
                sd[p + ".downsample.conv.weight"] = rnd(out, ci, 1, 1)
                sd[p + ".downsample.norm.weight"] = rnd(out) + 1
                sd[p + ".downsample.norm.bias"] = rnd(out)
    V = 768
    sd["pretrained.model.patch_embed.proj.weight"] = rnd(V, 1024, 1, 1)
    sd["pretrained.model.patch_embed.proj.bias"] = rnd(V)
    sd["pretrained.model.cls_token"] = rnd(1, 1, V)
    sd["pretrained.model.pos_embed"] = rnd(1, 24 * 24 + 1, V)
    for i in range(12):
        p = f"pretrained.model.blocks.{i}"
        sd[p + ".norm1.weight"] = rnd(V) + 1
        sd[p + ".norm1.bias"] = rnd(V)
        sd[p + ".attn.qkv.weight"] = rnd(3 * V, V, scale=0.05)
        sd[p + ".attn.qkv.bias"] = rnd(3 * V)
        sd[p + ".attn.proj.weight"] = rnd(V, V, scale=0.05)
        sd[p + ".attn.proj.bias"] = rnd(V)
        sd[p + ".norm2.weight"] = rnd(V) + 1
        sd[p + ".norm2.bias"] = rnd(V)
        sd[p + ".mlp.fc1.weight"] = rnd(4 * V, V, scale=0.05)
        sd[p + ".mlp.fc1.bias"] = rnd(4 * V)
        sd[p + ".mlp.fc2.weight"] = rnd(V, 4 * V, scale=0.05)
        sd[p + ".mlp.fc2.bias"] = rnd(V)
    sd["pretrained.act_postprocess3.0.project.0.weight"] = rnd(V, 2 * V,
                                                               scale=0.05)
    sd["pretrained.act_postprocess3.0.project.0.bias"] = rnd(V)
    sd["pretrained.act_postprocess3.3.weight"] = rnd(384, V, 1, 1)
    sd["pretrained.act_postprocess3.3.bias"] = rnd(384)
    sd["pretrained.act_postprocess4.0.project.0.weight"] = rnd(V, 2 * V,
                                                               scale=0.05)
    sd["pretrained.act_postprocess4.0.project.0.bias"] = rnd(V)
    sd["pretrained.act_postprocess4.3.weight"] = rnd(V, V, 1, 1)
    sd["pretrained.act_postprocess4.3.bias"] = rnd(V)
    sd["pretrained.act_postprocess4.4.weight"] = rnd(V, V, 3, 3)
    sd["pretrained.act_postprocess4.4.bias"] = rnd(V)
    F_ = 256
    for i, cin in ((1, 256), (2, 512), (3, 384), (4, 768)):
        sd[f"scratch.layer{i}_rn.weight"] = rnd(F_, cin, 3, 3)
        rp = f"scratch.refinenet{i}"
        for u in ("resConfUnit1", "resConfUnit2"):
            sd[f"{rp}.{u}.conv1.weight"] = rnd(F_, F_, 3, 3)
            sd[f"{rp}.{u}.conv1.bias"] = rnd(F_)
            sd[f"{rp}.{u}.conv2.weight"] = rnd(F_, F_, 3, 3)
            sd[f"{rp}.{u}.conv2.bias"] = rnd(F_)
        sd[f"{rp}.out_conv.weight"] = rnd(F_, F_, 1, 1)
        sd[f"{rp}.out_conv.bias"] = rnd(F_)
    sd["scratch.output_conv.0.weight"] = rnd(128, 256, 3, 3)
    sd["scratch.output_conv.0.bias"] = rnd(128)
    sd["scratch.output_conv.2.weight"] = rnd(32, 128, 3, 3)
    sd["scratch.output_conv.2.bias"] = rnd(32)
    sd["scratch.output_conv.4.weight"] = rnd(1, 32, 1, 1)
    sd["scratch.output_conv.4.bias"] = rnd(1)
    return sd


@pytest.fixture(scope="module")
def sd():
    return synthetic_omnidata_sd()


def test_converter_covers_exactly_the_model_tree(sd):
    """convert_state_dict(synthetic ckpt) == DPTDepthModel.init tree in
    paths AND shapes. refinenet4.res1 is intentionally absent from the
    converted tree (the checkpoint has it but the reference never
    executes it, blocks.py:331-338) — drop it from the init tree before
    comparing."""
    conv = D.convert_state_dict(sd)
    init = DM_INIT_PARAMS()
    # refinenet4 is called with skip=None, so its res1 never initializes
    # in the Flax tree — and the converter drops the checkpoint's unused
    # resConfUnit1 weights to match (blocks.py:331-338)
    assert "res1" not in init["refinenet4"]
    cp = {p: l.shape for p, l in _flat(conv)}
    ip = {p: l.shape for p, l in _flat(init)}
    missing = sorted(set(ip) - set(cp))
    extra = sorted(set(cp) - set(ip))
    assert not missing and not extra, (missing, extra)
    bad = [p for p in cp if cp[p] != ip[p]]
    assert not bad, {p: (cp[p], ip[p]) for p in bad}


def _flat(tree):
    return [("/".join(str(k.key) for k in path), leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]]


_CACHED = {}


def DM_INIT_PARAMS(size=128):
    if size not in _CACHED:
        _CACHED[size] = DM_INIT(size)
    return jax.tree_util.tree_map(lambda x: x, _CACHED[size])


def DM_INIT(size):
    model = D.DPTDepthModel()
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, size, size, 3)))["params"]


def test_dpt_e2e_provider_plumbing(tmp_path):
    """torch.save a lightning-style checkpoint of the synthetic state
    dict, then run the REAL loading path + predictor protocol at a small
    square size: load -> strip 'model.' -> convert -> jit forward ->
    clamp/resize. Proves provider='dpt' works end to end the moment a
    real checkpoint is dropped in."""
    sd = {"model." + k: torch.from_numpy(np.asarray(v))
          for k, v in synthetic_omnidata_sd().items()}
    path = str(tmp_path / "omnidata_dpt_depth_v2.ckpt")
    torch.save({"state_dict": sd}, path)

    pred = D.DPTDepthPredictor(path, size=128)
    img = RNG.uniform(size=(96, 120, 3)).astype(np.float32)
    depth = pred(img)
    assert depth.shape == (96, 120)
    assert np.isfinite(depth).all()
    # clamp happens BEFORE the bicubic resize back to frame resolution
    # (mono_estimators.py protocol), so a small overshoot is expected
    assert (depth >= -0.1).all() and (depth <= 1.1).all()
