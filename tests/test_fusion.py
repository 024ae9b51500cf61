"""Device-side proxy-depth fusion vs the reference's host pipeline
(scipy erosion + cv2 inpaint + LSQ alignment — src/mapper.py:258-301)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatslam_tpu.mapping import fusion
from splatslam_tpu.ops import lie


def test_erosion_matches_scipy():
    from scipy.ndimage import binary_erosion
    rng = np.random.RandomState(0)
    m = rng.rand(40, 56) > 0.3
    it = 5
    padded = np.pad(m.astype(int), it, mode="constant", constant_values=1)
    ref = binary_erosion(padded, np.ones((3, 3), int), iterations=it)
    ref = ref[it:-it, it:-it]
    got = jnp.asarray(m)[None]
    for _ in range(it):
        got = fusion._erode3(got)
    np.testing.assert_array_equal(np.asarray(got[0]), ref)


def test_push_pull_fill_smooth_field():
    """Holes in a smooth depth field are filled within a few percent."""
    ys, xs = np.mgrid[0:64, 0:96].astype(np.float32)
    d = 2.0 + 0.5 * np.sin(xs / 30) + 0.3 * np.cos(ys / 20)
    rng = np.random.RandomState(1)
    holes = rng.rand(64, 96) < 0.35
    holes[20:30, 40:60] = True        # a large contiguous hole
    x = d * ~holes
    filled = np.asarray(fusion.push_pull_fill(jnp.asarray(x)[None])[0])
    # known pixels unchanged
    np.testing.assert_allclose(filled[~holes], d[~holes], rtol=1e-5)
    # filled pixels close to the true smooth field
    rel = np.abs(filled[holes] - d[holes]) / d[holes]
    assert rel.mean() < 0.03 and rel.max() < 0.2


def _mk_scene(rng, B, H, W):
    disps = 0.3 + 0.2 * rng.rand(B, H, W).astype(np.float32)
    valid = rng.rand(B, H, W) > 0.3
    # mono ≈ affine(true depth) + noise, with a few large outliers
    depth = 1.0 / disps
    mono = 0.5 * depth + 0.2 + 0.01 * rng.randn(B, H, W).astype(np.float32)
    mono.flat[rng.randint(0, mono.size, 50)] *= 50.0
    poses = np.asarray(lie.exp(jnp.asarray(
        rng.randn(B, 6).astype(np.float32) * 0.1)))
    return disps, valid, mono, poses


def test_fuse_proxy_depth_semantics():
    rng = np.random.RandomState(2)
    B, H, W = 3, 48, 64
    disps, valid, mono, poses = _mk_scene(rng, B, H, W)
    # frame 2: too few valid pixels → invalid
    valid[2] = False
    valid[2, :3, :3] = True
    fused, w2c, sc, sh, invalid = fusion.fuse_proxy_depth(
        jnp.asarray(disps), jnp.asarray(valid), jnp.asarray(poses),
        jnp.asarray(mono), jnp.ones(B, bool))
    fused = np.asarray(fused)
    assert not bool(invalid[0]) and bool(invalid[2])
    # valid pixels keep the multiview depth exactly
    est = 1.0 / disps
    np.testing.assert_allclose(fused[0][valid[0]], est[0][valid[0]],
                               rtol=1e-5)
    # invalid pixels get a positive, finite mono-derived depth
    inv_px = fused[0][~valid[0]]
    assert np.all(np.isfinite(inv_px)) and (inv_px > 0).mean() > 0.95
    # fitted scale/shift recover the affine map (0.5, 0.2) → inverse is
    # scale≈2, shift≈-0.4
    assert abs(float(sc[0]) - 2.0) < 0.15
    assert abs(float(sh[0]) + 0.4) < 0.15
    # w2c matches the SE3 matrix of the pose vector
    np.testing.assert_allclose(
        np.asarray(w2c[0]), np.asarray(lie.to_matrix(jnp.asarray(poses[0]))),
        atol=1e-5)
    # invalid frame: depth is the raw masked multiview estimate
    np.testing.assert_allclose(fused[2][~valid[2]], 0.0, atol=1e-6)


def test_deform_batch_matches_sequential():
    from splatslam_tpu.mapping import gaussians as G
    from splatslam_tpu.mapping.mapper import deform_points

    rng = np.random.RandomState(3)
    C, H, W = 256, 32, 48
    st = G.make_state(C)
    n = 128
    new = dict(
        xyz=jnp.asarray(np.concatenate(
            [rng.randn(n, 2) * 0.5, 1.5 + rng.rand(n, 1)], -1), jnp.float32),
        color=jnp.asarray(rng.rand(n, 3), jnp.float32),
        scales=jnp.log(jnp.full((n, 3), 0.05)),
        valid=jnp.ones(n, bool), count=jnp.asarray(n))
    st = G.insert_points(st, new, 0)
    # split anchors between two keyframes
    st = dataclasses_replace_kfid(st, n, rng)

    intr = jnp.asarray([30.0, 30.0, W / 2, H / 2])
    ids = [4, 9]
    w2c_old = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    w2c_new = np.stack([
        np.asarray(lie.to_matrix(lie.exp(jnp.asarray([0.02, 0, 0.01,
                                                      0.005, 0, 0])))),
        np.asarray(lie.to_matrix(lie.exp(jnp.asarray([0, -0.03, 0,
                                                      0, 0.01, 0])))),
    ]).astype(np.float32)
    d_old = 2.0 + 0.1 * rng.rand(2, H, W).astype(np.float32)
    d_new = d_old * (1.0 + 0.05 * rng.randn(2, H, W).astype(np.float32))
    rigid = np.asarray([False, True])

    st_seq = st
    for i in range(2):
        st_seq = deform_points(
            st_seq, ids[i], jnp.asarray(w2c_new[i]), jnp.asarray(w2c_old[i]),
            jnp.asarray(d_new[i]), jnp.asarray(d_old[i]), intr,
            jnp.asarray(rigid[i]))

    st_bat = fusion.deform_points_batch(
        st, jnp.asarray(ids, jnp.int32), jnp.asarray(w2c_new),
        jnp.asarray(w2c_old), jnp.asarray(d_new), jnp.asarray(d_old),
        intr, jnp.asarray(rigid), jnp.ones(2, bool))

    np.testing.assert_allclose(np.asarray(st_bat.xyz),
                               np.asarray(st_seq.xyz), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_bat.rotation),
                               np.asarray(st_seq.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_bat.scaling),
                               np.asarray(st_seq.scaling), atol=1e-5)


def dataclasses_replace_kfid(st, n, rng):
    import dataclasses
    kf = np.zeros(st.kf_id.shape[0], np.int32)
    kf[:n] = np.where(rng.rand(n) < 0.5, 4, 9)
    return dataclasses.replace(st, kf_id=jnp.asarray(kf))


def test_refresh_writeback_semantics():
    """mapper._refresh_writeback: only live rows write scale/shift; pad
    rows (OOB sel) and invalid rows are dropped even when they duplicate
    a live row's index; the packed pull is [w2c.flat | invalid]."""
    import jax.numpy as jnp
    from splatslam_tpu.mapping.mapper import _refresh_writeback

    buf = 8
    scale0 = jnp.arange(buf, dtype=jnp.float32)
    shift0 = 10.0 + jnp.arange(buf, dtype=jnp.float32)
    # rows: [real kf 2 (ok), real kf 5 (fusion failed), pad dup of 2]
    sel = jnp.asarray(np.array([2, 5, buf], np.int32))  # pad already OOB
    sc = jnp.asarray([100.0, 200.0, 300.0])
    sh = jnp.asarray([-1.0, -2.0, -3.0])
    invalid = jnp.asarray([False, True, False])
    w2c = jnp.tile(jnp.eye(4)[None], (3, 1, 1))

    scale, shift, small = _refresh_writeback(
        scale0, shift0, sc, sh, sel, w2c, invalid)
    scale, shift, small = map(np.asarray, (scale, shift, small))

    assert scale[2] == 100.0 and shift[2] == -1.0        # live row wrote
    assert scale[5] == 5.0 and shift[5] == 15.0          # invalid kept old
    untouched = [i for i in range(8) if i not in (2, 5)]
    np.testing.assert_array_equal(scale[untouched],
                                  np.asarray(scale0)[untouched])
    assert small.shape == (3, 17)
    np.testing.assert_array_equal(small[:, 16], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(small[0, :16].reshape(4, 4), np.eye(4))
