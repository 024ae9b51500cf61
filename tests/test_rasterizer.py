"""Tile rasterizer validated against the exact per-pixel reference renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatslam_tpu.ops import rasterizer as rz
from splatslam_tpu.ops import lie


def make_gaussians(n=64, seed=0, spread=1.0, z0=2.0):
    rng = np.random.RandomState(seed)
    means = np.concatenate([
        rng.randn(n, 2) * spread, z0 + rng.rand(n, 1) * 2.0], -1)
    scales = 0.05 + 0.15 * rng.rand(n, 3)
    rots = rng.randn(n, 4)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    opac = 0.3 + 0.6 * rng.rand(n)
    cols = rng.rand(n, 3)
    return (jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(rots, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(cols, jnp.float32))


CAM = dict(H=48, W=64)
INTR = jnp.asarray([40.0, 40.0, 32.0, 24.0])
BG = jnp.asarray([0.0, 0.0, 0.0])
W2C = jnp.eye(4)
TAU0 = jnp.zeros(6)


def test_matches_reference_renderer():
    means, scales, rots, opac, cols = make_gaussians(96)
    alive = jnp.ones(96, bool)
    out = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, TAU0,
                       INTR, BG, H=CAM["H"], W=CAM["W"], K=128, chunk_k=16)
    cref, dref, aref = rz.rasterize_reference(
        means, scales, rots, opac, cols, alive, W2C, TAU0, INTR, BG,
        H=CAM["H"], W=CAM["W"])
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(cref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(dref),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(aref),
                               atol=2e-3)
    assert float(out.alpha.max()) > 0.5  # scene actually covers pixels
    # visible gaussians get radii and touch pixels
    assert int((out.radii > 0).sum()) > 50
    assert int((out.n_touched > 0).sum()) > 30


def test_dead_gaussians_invisible():
    means, scales, rots, opac, cols = make_gaussians(32)
    alive = jnp.zeros(32, bool).at[:16].set(True)
    out = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, TAU0,
                       INTR, BG, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
    assert int(out.n_touched[16:].sum()) == 0
    assert float(out.radii[16:].max()) == 0.0


def test_background_blending():
    means, scales, rots, opac, cols = make_gaussians(4)
    alive = jnp.zeros(4, bool)  # nothing alive → pure background
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, TAU0,
                       INTR, bg, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.broadcast_to(np.asarray(bg), (48, 64, 3)),
                               atol=1e-6)


def test_gradients_flow_everywhere():
    means, scales, rots, opac, cols = make_gaussians(48)
    alive = jnp.ones(48, bool)
    target = jnp.zeros((CAM["H"], CAM["W"], 3)) + 0.5

    def loss_fn(means, scales, rots, opac, cols, tau, dummy):
        out = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, tau,
                           INTR, BG, means2d_dummy=dummy,
                           H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
        return jnp.abs(out.color - target).mean() + 0.1 * out.depth.mean()

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5, 6))(
        means, scales, rots, opac, cols, TAU0, jnp.zeros((48, 2)))
    names = ["means", "scales", "rots", "opac", "cols", "tau", "means2d"]
    for name, g in zip(names, grads):
        assert bool(jnp.isfinite(g).all()), name
        assert float(jnp.abs(g).max()) > 0, f"zero grad for {name}"


def test_pose_gradient():
    """tau gradients: tile path == exact path (tight), and ≈ finite
    differences on dominant components (loose — the hard ALPHA_MIN /
    T_MIN cutoffs make the loss only piecewise smooth, exactly like the
    CUDA rasterizer)."""
    means, scales, rots, opac, cols = make_gaussians(24, seed=3)
    alive = jnp.ones(24, bool)
    target = jnp.linspace(0, 1, CAM["H"] * CAM["W"] * 3).reshape(
        CAM["H"], CAM["W"], 3)

    def loss_fast(tau):
        out = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, tau,
                           INTR, BG, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
        return jnp.sum((out.color - target) ** 2)

    def loss_ref(tau):
        c, _, _ = rz.rasterize_reference(
            means, scales, rots, opac, cols, alive, W2C, tau, INTR, BG,
            H=CAM["H"], W=CAM["W"])
        return jnp.sum((c - target) ** 2)

    g_fast = np.asarray(jax.grad(loss_fast)(TAU0))
    g_ref = np.asarray(jax.grad(loss_ref)(TAU0))
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-3, atol=1e-3)

    eps = 3e-3
    for k in range(6):
        fd = (float(loss_fast(TAU0.at[k].add(eps)))
              - float(loss_fast(TAU0.at[k].add(-eps)))) / (2 * eps)
        denom = max(abs(fd), abs(g_fast[k]))
        if denom > 20.0:  # dominant, FD-measurable components:
            # same sign and within 2x — all FD can certify on a
            # piecewise-smooth loss (verified: FD itself moves ~40%
            # between eps=1e-2 and 1e-3 on this scene)
            assert np.sign(fd) == np.sign(g_fast[k]), (k, fd, g_fast[k])
            assert 0.5 < abs(fd / g_fast[k]) < 2.0, (k, fd, g_fast[k])


def test_tau_moves_camera():
    means, scales, rots, opac, cols = make_gaussians(48, seed=5)
    alive = jnp.ones(48, bool)
    out0 = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, TAU0,
                        INTR, BG, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
    tau = jnp.zeros(6).at[0].set(0.1)  # shift right
    out1 = rz.rasterize(means, scales, rots, opac, cols, alive, W2C, tau,
                        INTR, BG, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
    # applying +x camera translation shifts content left
    diff = float(jnp.abs(out1.color - out0.color).mean())
    assert diff > 1e-3
    # and equals rendering with the composed base pose
    w2c2 = lie.to_matrix(lie.exp(tau)) @ W2C
    out2 = rz.rasterize(means, scales, rots, opac, cols, alive, w2c2, TAU0,
                        INTR, BG, H=CAM["H"], W=CAM["W"], K=64, chunk_k=16)
    np.testing.assert_allclose(np.asarray(out1.color), np.asarray(out2.color),
                               atol=1e-5)


def test_batch_matches_single_camera_loop():
    """rasterize_batch must equal per-camera rasterize calls exactly."""
    rng = np.random.RandomState(3)
    N, H, W, K = 96, 32, 48, 32
    means = jnp.asarray(np.concatenate(
        [rng.randn(N, 2) * 0.5, 1.5 + rng.rand(N, 1) * 2.0], -1), jnp.float32)
    scales = jnp.asarray(0.02 + 0.05 * rng.rand(N, 3), jnp.float32)
    rots = jnp.asarray(rng.randn(N, 4), jnp.float32)
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jnp.asarray(0.2 + 0.7 * rng.rand(N), jnp.float32)
    cols = jnp.asarray(rng.rand(N, 3), jnp.float32)
    alive = jnp.asarray(rng.rand(N) > 0.2)
    intr = jnp.asarray([40.0, 40.0, W / 2, H / 2])
    B = 3
    taus = jnp.asarray(rng.randn(B, 6) * 0.02, jnp.float32)
    w2cs = jnp.stack([jnp.eye(4)] * B)
    out_b = rz.rasterize_batch(means, scales, rots, opac, cols, alive,
                               w2cs, taus, intr, jnp.zeros(3),
                               H=H, W=W, K=K)
    for b in range(B):
        out_s = rz.rasterize(means, scales, rots, opac, cols, alive,
                             w2cs[b], taus[b], intr, jnp.zeros(3),
                             H=H, W=W, K=K)
        np.testing.assert_allclose(np.asarray(out_b.color[b]),
                                   np.asarray(out_s.color), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b.depth[b]),
                                   np.asarray(out_s.depth), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_b.n_touched[b]),
                                      np.asarray(out_s.n_touched))


def test_composite_custom_vjp_matches_autodiff():
    """The hand-written compositing backward (suffix-sum form) must match
    autodiff of the same forward scan, for every packet field."""
    rng = np.random.RandomState(7)
    T, K, P, ck = 6, 16, 64, 4
    n_pk = 40
    ids = rng.randint(-1, n_pk, size=(T, K)).astype(np.int32)
    pix = jnp.asarray(rng.rand(T, P, 2).astype(np.float32) * 16.0)
    pk = np.zeros((n_pk + 1, 10), np.float32)
    pk[:n_pk, 0:2] = rng.rand(n_pk, 2) * 16.0          # mean2d
    pk[:n_pk, 2] = 0.2 + rng.rand(n_pk)                # conic a
    pk[:n_pk, 3] = 0.05 * rng.randn(n_pk)              # conic b
    pk[:n_pk, 4] = 0.2 + rng.rand(n_pk)                # conic c
    pk[:n_pk, 5:8] = rng.rand(n_pk, 3)                 # color
    pk[:n_pk, 8] = 0.1 + 0.85 * rng.rand(n_pk)         # opacity
    pk[:n_pk, 9] = 1.0 + rng.rand(n_pk)                # depth
    packets = jnp.asarray(pk)
    ids_j = jnp.asarray(ids)

    cts = (jnp.asarray(rng.randn(T, P, 3).astype(np.float32)),
           jnp.asarray(rng.randn(T, P).astype(np.float32)),
           jnp.asarray(rng.randn(T, P).astype(np.float32)))

    def loss_ref(p):
        tl = p[jnp.where(ids_j >= 0, ids_j, n_pk)]
        c, d, a, _ = rz._composite_scan(ids_j, pix, tl, ck, False)
        return (c * cts[0]).sum() + (d * cts[1]).sum() + (a * cts[2]).sum()

    def loss_custom(p):
        c, d, a, _ = rz._composite(ids_j, pix, p, ck)
        return (c * cts[0]).sum() + (d * cts[1]).sum() + (a * cts[2]).sum()

    g_ref = jax.grad(loss_ref)(packets)
    g_cus = jax.grad(loss_custom)(packets)
    np.testing.assert_allclose(np.asarray(g_cus), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("ntx,nty", [(3, 2), (4, 2)])
def test_pallas_composite_matches_xla_interpret(ntx, nty):
    """Pallas fwd/bwd kernels (interpret mode) vs the XLA compositor on
    a small camera batch: outputs, n_touched, and packet gradients.

    (3,2) → 6 tiles exercises TB=2 blocking; (4,2) → 8 tiles exercises
    the full TB=8 multi-tile grid block."""
    from splatslam_tpu.ops import raster_pallas as rp

    rng = np.random.RandomState(11)
    B, K, N = 2, 16, 128
    T = ntx * nty
    ids_np = np.full((B, T, K), -1, np.int32)
    counts_np = np.zeros((B, T), np.int32)
    for b in range(B):
        for t in range(T):
            c = rng.randint(0, K + 4)
            counts_np[b, t] = c
            ids_np[b, t, :min(c, K)] = rng.randint(0, N, min(c, K))
    pk = np.zeros((B, N, 10), np.float32)
    pk[..., 0] = rng.rand(B, N) * ntx * 16.0
    pk[..., 1] = rng.rand(B, N) * nty * 16.0
    pk[..., 2] = 0.05 + 0.1 * rng.rand(B, N)
    pk[..., 3] = 0.01 * rng.randn(B, N)
    pk[..., 4] = 0.05 + 0.1 * rng.rand(B, N)
    pk[..., 5:8] = rng.rand(B, N, 3)
    pk[..., 8] = 0.1 + 0.85 * rng.rand(B, N)
    pk[..., 9] = 1.0 + rng.rand(B, N)
    packets = jnp.asarray(pk)
    tile_ids = jnp.asarray(ids_np)
    counts = jnp.asarray(counts_np)

    # XLA reference: global-id path through _composite
    packets_flat = jnp.concatenate(
        [packets.reshape(B * N, 10), jnp.zeros((1, 10))], 0)
    cam_off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    ids_glob = jnp.where(tile_ids >= 0, tile_ids + cam_off, -1)
    pix = rz._tile_pixel_grid(ntx, nty)
    pix_b = jnp.broadcast_to(pix[None], (B,) + pix.shape).reshape(
        B * T, -1, 2)

    cts = (jnp.asarray(rng.randn(B * T, 256, 3).astype(np.float32)),
           jnp.asarray(rng.randn(B * T, 256).astype(np.float32)),
           jnp.asarray(rng.randn(B * T, 256).astype(np.float32)))

    def loss_ref(p):
        pf = jnp.concatenate([p.reshape(B * N, 10),
                              jnp.zeros((1, 10))], 0)
        c, d, a, _ = rz._composite(ids_glob.reshape(B * T, K), pix_b,
                                   pf, 4)
        return ((c * cts[0]).sum() + (d * cts[1]).sum()
                + (a * cts[2]).sum())

    c_r, d_r, a_r, tch_r = rz._composite(
        ids_glob.reshape(B * T, K), pix_b, packets_flat, 4)
    flat_ids = jnp.where(ids_glob >= 0, ids_glob, B * N).reshape(-1)
    nt_r = jax.ops.segment_sum(tch_r.reshape(-1), flat_ids,
                               num_segments=B * N + 1)[:-1].reshape(B, N)

    # Pallas interpret-mode forward
    tl_T, ids_smem, counts_flat = rz._pallas_prep(tile_ids, counts,
                                                  packets)
    out, ntouch = rp.composite_fwd_pallas(
        counts_flat, tl_T, ids_smem, B, T, ntx, N, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, 0:3, :].transpose(0, 2, 1)),
                               np.asarray(c_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3, :]), np.asarray(d_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 4, :]), np.asarray(a_r),
                               atol=1e-5)
    nt_p = np.asarray(ntouch[:, :, 0, :]).reshape(B, N)
    np.testing.assert_array_equal(nt_p, np.asarray(nt_r))

    # want_touched=False: same image outputs, dummy touch buffer, and the
    # per-entry accumulation loop statically skipped
    out_nt, ntouch_nt = rp.composite_fwd_pallas(
        counts_flat, tl_T, ids_smem, B, T, ntx, N, interpret=True,
        want_touched=False)
    np.testing.assert_allclose(np.asarray(out_nt), np.asarray(out),
                               atol=1e-6)
    assert ntouch_nt.shape == (B, 1, 8, 128)

    # Pallas interpret-mode backward vs autodiff of the XLA path
    g_ref = jax.grad(loss_ref)(packets)
    gpack = jnp.concatenate(
        [cts[0].transpose(0, 2, 1), cts[1][:, None, :],
         cts[2][:, None, :], jnp.zeros((B * T, 3, 256))], 1)
    acc = rp.composite_bwd_pallas(
        counts_flat, tl_T, ids_smem, gpack, out, B, T, ntx, N,
        interpret=True)
    acc = acc.transpose(0, 2, 1, 3).reshape(B, 16, N)
    g_pal = acc[:, :10, :].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_prebinned_matches_inline_binning():
    """bin_batch + prebinned rasterize_batch == rasterize_batch with its
    internal binning (margin 0), and a margined binning renders the same
    image (margin only ADDS sub-cutoff entries)."""
    rng = np.random.RandomState(3)
    N, B, H, W = 96, 2, 48, 64
    means = jnp.asarray(np.concatenate(
        [rng.randn(N, 2) * 0.8, 2.0 + rng.rand(N, 1) * 2.0], -1),
        jnp.float32)
    scales = jnp.asarray(0.02 + 0.05 * rng.rand(N, 3), jnp.float32)
    rots = jnp.asarray(rng.randn(N, 4), jnp.float32)
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jnp.asarray(0.2 + 0.7 * rng.rand(N), jnp.float32)
    cols = jnp.asarray(rng.rand(N, 3), jnp.float32)
    alive = jnp.asarray(rng.rand(N) > 0.2)
    intr = jnp.asarray([60.0, 60.0, W / 2.0, H / 2.0])
    w2cs = jnp.tile(jnp.eye(4), (B, 1, 1))
    taus = jnp.asarray(0.01 * rng.randn(B, 6), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    # K well above tile occupancy: margin entries are exact zeros under
    # the ALPHA_MIN gate, but at a tight K they can displace real
    # contributors past the cap (the production configs run K=128-256)
    kw = dict(H=H, W=W, K=96)
    base = rz.rasterize_batch(means, scales, rots, opac, cols, alive,
                              w2cs, taus, intr, bg, **kw)
    ids, cnt = rz.bin_batch(means, scales, rots, opac, alive, w2cs, taus,
                            intr, **kw)
    pre = rz.rasterize_batch(means, scales, rots, opac, cols, alive,
                             w2cs, taus, intr, bg, None, ids, cnt, **kw)
    np.testing.assert_allclose(np.asarray(pre.color),
                               np.asarray(base.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre.depth),
                               np.asarray(base.depth), atol=1e-6)

    ids_m, cnt_m = rz.bin_batch(means, scales, rots, opac, alive, w2cs,
                                taus, intr, margin=4.0, **kw)
    prem = rz.rasterize_batch(means, scales, rots, opac, cols, alive,
                              w2cs, taus, intr, bg, None, ids_m, cnt_m,
                              **kw)
    np.testing.assert_allclose(np.asarray(prem.color),
                               np.asarray(base.color), atol=1e-5)

    # want_touched=False: identical images, zero n_touched
    nt = rz.rasterize_batch(means, scales, rots, opac, cols, alive,
                            w2cs, taus, intr, bg, want_touched=False,
                            **kw)
    np.testing.assert_allclose(np.asarray(nt.color),
                               np.asarray(base.color), atol=1e-6)
    assert int(jnp.sum(nt.n_touched)) == 0


def test_overflow_accounting_and_pallas_capacity():
    """VERDICT r1 #4: the rasterizer's bounded-work caps must be
    observable. An over-dense tile (every Gaussian on one spot, tiny K)
    must report tile-list overflow via raster_health, and the doubled
    Gaussian capacity 262,144 must still satisfy the Pallas row cap
    (no silent demotion to the XLA scan path)."""
    rng = np.random.RandomState(0)
    N, H, W = 64, 32, 32
    # all Gaussians piled onto the image center → one over-dense tile
    means = jnp.asarray(np.concatenate(
        [rng.randn(N, 2) * 0.01, np.full((N, 1), 2.0)], -1), jnp.float32)
    scales = jnp.full((N, 3), 0.05, jnp.float32)
    rots = jnp.asarray(rng.randn(N, 4), jnp.float32)
    rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
    opac = jnp.full((N,), 0.9, jnp.float32)
    alive = jnp.ones(N, bool)
    intr = jnp.asarray([40.0, 40.0, W / 2.0, H / 2.0])
    w2cs = jnp.tile(jnp.eye(4), (1, 1, 1))
    taus = jnp.zeros((1, 6))

    K = 16   # far below the pile-up → guaranteed overflow
    overflow, crop, max_count = rz.raster_health(
        means, scales, rots, opac, alive, w2cs, taus, intr,
        H=H, W=W, K=K)
    assert int(max_count) > K
    assert float(overflow) > 0.05
    assert 0.0 <= float(crop) <= 1.0

    # spread Gaussians → no overflow
    means2 = jnp.asarray(np.concatenate(
        [rng.uniform(-0.35, 0.35, (N, 2)), 2.0 + rng.rand(N, 1)], -1),
        jnp.float32)
    overflow2, _, _ = rz.raster_health(
        means2, scales, rots, opac, alive, w2cs, taus, intr,
        H=H, W=W, K=64)
    assert float(overflow2) == 0.0

    # capacity 2^18 stays under the Pallas compositor's row cap
    assert 262144 <= rz._PALLAS_MAX_ROWS
    assert 262144 % 128 == 0
    # and the demotion above the cap is never silent
    import io, contextlib, sys
    rz._warned_demotion.discard(rz._PALLAS_MAX_ROWS * 2)
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert not rz._pallas_ok(rz._PALLAS_MAX_ROWS * 2)
    assert "demotes" in buf.getvalue()


def test_mapper_log_raster_health(tmp_path):
    """The mapper's periodic health log returns the packed accounting."""
    from splatslam_tpu.mapping import gaussians as G
    from splatslam_tpu.mapping.mapper import Mapper

    class _Dummy:
        pass

    m = _Dummy()
    m._drain_pack = lambda: None  # mapper drains deferred packs first
    m.current_window = [0]
    m.K = 32
    m.max_span = 4
    m.H, m.W = 32, 32
    m.intrinsics = jnp.asarray([40.0, 40.0, 16.0, 16.0])
    m.printer = None
    st = G.make_state(256)
    rng = np.random.RandomState(1)
    n = 128
    new = dict(xyz=jnp.asarray(np.concatenate(
        [rng.randn(n, 2) * 0.2, 2.0 + rng.rand(n, 1)], -1), jnp.float32),
        color=jnp.asarray(rng.rand(n, 3), jnp.float32),
        scales=jnp.log(jnp.full((n, 3), 0.03)),
        valid=jnp.ones(n, bool), count=jnp.asarray(n))
    m.st = G.insert_points(st, new, 0)
    cam = _Dummy()
    cam.w2c = np.eye(4, dtype=np.float32)
    m.viewpoints = {0: cam}
    out = Mapper.log_raster_health(m)
    assert out is not None
    overflow, crop, max_count = out
    assert 0.0 <= overflow <= 1.0 and max_count >= 0
