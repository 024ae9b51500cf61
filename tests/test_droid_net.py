"""DroidNet structure + torch-parity tests.

BasicEncoder and ConvGRU are checked numerically against the reference
torch modules (loaded from /root/reference by file path, random weights,
converted with models/weights.py) — this validates both the architecture
and the weight converter without needing the released checkpoint.
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatslam_tpu.models import DroidNet, init_params
from splatslam_tpu.models.weights import torch_state_to_params
from splatslam_tpu.ops.upsample import cvx_upsample
from splatslam_tpu.ops import corr as corr_ops


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_shapes_and_init():
    params = init_params(jax.random.PRNGKey(0), H=48, W=64)
    net = DroidNet()
    imgs = jnp.zeros((2, 48, 64, 3))
    fmap = net.apply({"params": params}, imgs, method=DroidNet.features)
    assert fmap.shape == (2, 6, 8, 128)
    cn, ci = net.apply({"params": params}, imgs, method=DroidNet.context)
    assert cn.shape == (2, 6, 8, 128) and ci.shape == (2, 6, 8, 128)
    assert float(jnp.abs(cn).max()) <= 1.0
    assert float(ci.min()) >= 0.0

    h, w, N = 6, 8, 3
    out = net.apply(
        {"params": params},
        jnp.zeros((N, h, w, 128)), jnp.zeros((N, h, w, 128)),
        jnp.ones((N, h, w, 196)), jnp.zeros((N, h, w, 4)),
        jnp.asarray([0, 0, 1]), 2,
        method=lambda m, *a: m.update(*a))
    net_h, delta, weight, eta, upmask = out
    assert net_h.shape == (N, h, w, 128)
    assert delta.shape == (N, h, w, 2)
    assert weight.shape == (N, h, w, 2)
    assert float(weight.min()) >= 0.0 and float(weight.max()) <= 1.0
    assert eta.shape == (2, h, w) and float(eta.min()) >= 0.0
    assert upmask.shape == (2, h, w, 576)


@pytest.mark.parametrize("norm_fn", ["instance", "none"])
def test_basic_encoder_matches_torch(norm_fn):
    torch = pytest.importorskip("torch")
    ext = _load_ref_module(
        "ref_extractor",
        "/root/reference/thirdparty/glorie_slam/modules/droid_net/extractor.py")
    tnet = ext.BasicEncoder(out_dim=16, norm_fn=norm_fn).eval()
    sd = {f"fnet.{k}": v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_state_to_params(sd)["fnet"]

    from splatslam_tpu.models.droid_net import BasicEncoder
    jnet = BasicEncoder(out_dim=16, norm_fn=norm_fn)

    x = np.random.RandomState(0).randn(2, 32, 40, 3).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x).permute(0, 3, 1, 2)[None])  # (1,B,C,H,W)
    tout = tout[0].permute(0, 2, 3, 1).numpy()
    jout = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, atol=2e-4, rtol=1e-3)


def test_conv_gru_matches_torch():
    torch = pytest.importorskip("torch")
    gru_mod = _load_ref_module(
        "ref_gru",
        "/root/reference/thirdparty/glorie_slam/modules/droid_net/gru.py")
    tg = gru_mod.ConvGRU(128, 128 + 128 + 64).eval()
    sd = {f"update.gru.{k}": v.detach().numpy() for k, v in tg.state_dict().items()}
    params = torch_state_to_params(sd)["update"]["gru"]

    from splatslam_tpu.models.droid_net import ConvGRU
    jg = ConvGRU(128)

    rng = np.random.RandomState(1)
    net = rng.randn(2, 6, 8, 128).astype(np.float32)
    inp = rng.randn(2, 6, 8, 128 + 128 + 64).astype(np.float32)
    with torch.no_grad():
        tout = tg(torch.from_numpy(net).permute(0, 3, 1, 2),
                  torch.from_numpy(inp).permute(0, 3, 1, 2))
    tout = tout.permute(0, 2, 3, 1).numpy()
    jout = np.asarray(jg.apply({"params": params}, jnp.asarray(net), jnp.asarray(inp)))
    np.testing.assert_allclose(jout, tout, atol=2e-4, rtol=1e-3)


def test_cvx_upsample_partition_of_unity():
    """Uniform mask → each 8x8 block is the mean of the 3x3 neighborhood."""
    B, H, W = 1, 4, 5
    data = jnp.asarray(np.random.RandomState(2).rand(B, H, W, 1), jnp.float32)
    mask = jnp.zeros((B, H, W, 576))
    up = cvx_upsample(data, mask)
    assert up.shape == (B, 8 * H, 8 * W, 1)
    padded = np.pad(np.asarray(data[0, ..., 0]), 1)
    mean9 = sum(padded[ky:ky + H, kx:kx + W] for ky in range(3) for kx in range(3)) / 9
    got = np.asarray(up[0, ::8, ::8, 0])
    np.testing.assert_allclose(got, mean9, atol=1e-5)
    # constant field with uniform interior neighborhoods stays constant
    const = cvx_upsample(jnp.ones((1, 6, 6, 1)), jnp.zeros((1, 6, 6, 576)))
    np.testing.assert_allclose(np.asarray(const[0, 8:-8, 8:-8, 0]), 1.0, atol=1e-5)


def test_corr_lookup_matches_manual_bilinear():
    """Integer + half-pixel lookups against direct volume indexing."""
    rng = np.random.RandomState(3)
    N, H, W, C = 2, 8, 10, 16
    f1 = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    f2 = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    pyr = corr_ops.build_corr_pyramid(f1, f2, num_levels=2)
    vol = np.asarray(pyr[0])

    # integer coords: channel (i,j) == volume[y, x, y+j-r, x+i-r]
    grid_x, grid_y = np.meshgrid(np.arange(W), np.arange(H))
    coords = jnp.asarray(
        np.stack([grid_x, grid_y], -1)[None].repeat(N, 0), jnp.float32)
    out = np.asarray(corr_ops.lookup_pyramid(pyr, coords, radius=1))
    rd = 3
    for (i, j) in [(0, 0), (1, 1), (2, 0), (0, 2)]:
        c = i * rd + j
        y, x = 4, 5
        xx, yy = x + i - 1, y + j - 1
        np.testing.assert_allclose(out[0, y, x, c], vol[0, y, x, yy, xx],
                                   rtol=1e-4, atol=1e-5)
    # half-pixel: bilinear average of 4 neighbors
    coords_h = coords + 0.5
    out_h = np.asarray(corr_ops.lookup_pyramid(pyr, coords_h, radius=1))
    y, x = 3, 4
    c = 1 * rd + 1  # center channel samples at (x+0.5, y+0.5)
    manual = vol[0, y, x, y:y + 2, x:x + 2].mean()
    np.testing.assert_allclose(out_h[0, y, x, c], manual, rtol=1e-4, atol=1e-5)

    # out-of-bounds → zero
    far = coords + 100.0
    out_far = np.asarray(corr_ops.lookup_pyramid(pyr, far, radius=1))
    assert np.abs(out_far[:, :, :, : rd * rd]).max() == 0.0


def test_alt_corr_matches_volume_lookup():
    """alt-corr must equal the precomputed-volume lookup (corr.py parity)."""
    rng = np.random.RandomState(4)
    P, H, W, C = 3, 8, 8, 16
    fmaps = jnp.asarray(rng.randn(P, H, W, C), jnp.float32)
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 2], jnp.int32)
    coords = jnp.asarray(
        rng.rand(2, H, W, 2) * np.asarray([W - 1, H - 1]), jnp.float32)

    pyr_vol = corr_ops.build_corr_pyramid(fmaps[ii], fmaps[jj], num_levels=2)
    want = np.asarray(corr_ops.lookup_pyramid(pyr_vol, coords, radius=2))

    fpyr = corr_ops.build_fmap_pyramid(fmaps, num_levels=2)
    got = np.asarray(corr_ops.alt_corr(fpyr, ii, jj, coords, radius=2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_corr_pyramid_odd_dims():
    """avg-pool must floor odd dims like torch (regression: W/8 = 12 → 3)."""
    f = jnp.ones((1, 8, 12, 4))
    pyr = corr_ops.build_corr_pyramid(f, f, num_levels=4)
    assert pyr[3].shape == (1, 8, 12, 1, 1)
    fpyr = corr_ops.build_fmap_pyramid(f, num_levels=4)
    assert fpyr[3].shape == (1, 1, 1, 4)
