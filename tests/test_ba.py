"""Bundle-adjustment layer tests.

Validates the sparse-Schur on-chip DBA against (a) a dense construction of
the identical normal equations and (b) convergence on a synthetic scene
rendered from ground-truth geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np

from splatslam_tpu.ops import ba, lie, projective as pops


def make_scene(seed=0, P=5, H=8, W=12):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    # smooth forward motion with small rotation
    xs = np.cumsum(rng.randn(P, 6) * np.array([0.08, 0.08, 0.15, 0.02, 0.02, 0.02]), axis=0)
    poses_gt = lie.exp(jnp.asarray(xs, jnp.float32))
    disps_gt = 0.4 + 0.3 * jax.random.uniform(key, (P, H, W))
    intr = jnp.asarray([12.0, 12.0, W / 2.0, H / 2.0])
    ii = []
    jj = []
    for i in range(P):
        for j in range(P):
            if i != j and abs(i - j) <= 2:
                ii.append(i)
                jj.append(j)
    ii = np.asarray(ii, np.int32)
    jj = np.asarray(jj, np.int32)
    intr_t = jnp.broadcast_to(intr, (P, 4))
    target, valid = pops.projective_transform(
        poses_gt[None], disps_gt[None], intr_t[None],
        jnp.asarray(ii), jnp.asarray(jj))
    weight = jnp.ones_like(target) * valid
    return poses_gt, disps_gt, intr, ii, jj, target[0], weight[0]


def flow_error(poses, disps, intr, ii, jj, target):
    P = poses.shape[0]
    intr_t = jnp.broadcast_to(intr, (P, 4))
    coords, valid = pops.projective_transform(
        poses[None], disps[None], intr_t[None],
        jnp.asarray(ii), jnp.asarray(jj))
    err = jnp.abs(coords[0] - target) * valid[0]
    return float(err.mean())


def test_dba_converges_to_gt_targets():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_scene()
    P, H, W = disps_gt.shape
    # perturb
    key = jax.random.PRNGKey(42)
    dxi = jax.random.normal(key, (P, 6)) * 0.02
    dxi = dxi.at[0].set(0.0)  # keep first pose anchored
    poses0 = lie.retr(poses_gt, dxi)
    disps0 = disps_gt * (1.0 + 0.15 * jax.random.normal(key, (P, H, W)))
    disps0 = jnp.clip(disps0, 0.05, None)

    t0, t1 = 1, P
    plan = ba.make_edge_plan(ii, jj, t0, t1, edge_bucket=8, depth_bucket=4,
                             group_bucket=4, pose_bucket=4)
    eta = jnp.full((plan.M, H, W), 1e-4)
    sens = jnp.zeros_like(disps0)

    e0 = flow_error(poses0, disps0, intr, ii, jj, target)
    poses, disps = poses0, disps0
    for _ in range(12):
        poses, disps = ba.dba(poses, disps, intr, target, weight, eta, sens,
                              plan, iters=2, lm=1e-4, ep=0.01)
    e1 = flow_error(poses, disps, intr, ii, jj, target)
    assert np.isfinite(e1)
    assert e1 < 0.05 * e0, (e0, e1)


def test_dba_motion_only():
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_scene(seed=3)
    P, H, W = disps_gt.shape
    key = jax.random.PRNGKey(7)
    dxi = jax.random.normal(key, (P, 6)) * 0.02
    dxi = dxi.at[0].set(0.0)
    poses0 = lie.retr(poses_gt, dxi)

    plan = ba.make_edge_plan(ii, jj, 1, P, edge_bucket=8, depth_bucket=4,
                             group_bucket=4, pose_bucket=4)
    eta = jnp.full((plan.M, H, W), 1e-4)
    sens = jnp.zeros_like(disps_gt)
    e0 = flow_error(poses0, disps_gt, intr, ii, jj, target)
    poses = poses0
    for _ in range(8):
        poses, _ = ba.dba(poses, disps_gt, intr, target, weight, eta, sens,
                          plan, iters=2, ep=0.01, motion_only=True)
    e1 = flow_error(poses, disps_gt, intr, ii, jj, target)
    assert e1 < 0.1 * e0, (e0, e1)


def test_sparse_schur_matches_dense():
    """One GN iteration of the sparse-E path == dense normal equations."""
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_scene(seed=1, P=4)
    P_all, H, W = disps_gt.shape
    HW = H * W
    key = jax.random.PRNGKey(5)
    poses0 = lie.retr(poses_gt, jax.random.normal(key, (P_all, 6)) * 0.01)
    disps0 = jnp.clip(disps_gt + 0.05 * jax.random.normal(key, (P_all, H, W)), 0.05, None)

    t0, t1 = 1, P_all
    plan = ba.make_edge_plan(ii, jj, t0, t1, edge_bucket=4, depth_bucket=4,
                             group_bucket=4, pose_bucket=1)
    P = plan.P
    eta = jnp.full((plan.M, H, W), 1e-3)
    sens = jnp.zeros_like(disps0)

    dx_sp, dz_sp = ba._dba_iteration(
        poses0, disps0, intr, target, weight, eta.reshape(plan.M, H, W),
        sens, plan, lm=1e-4, ep=0.1, motion_only=False)

    # dense reference of the same system
    iij = jnp.asarray(ii)
    jjj = jnp.asarray(jj)
    Hb, vb, (Ei, Ej), Ck, wk = ba._edge_terms(
        poses0, disps0, intr, target, weight, iij, jjj)
    N = ii.shape[0]
    kx = np.unique(np.concatenate([np.arange(t0, t1), ii]))
    M = len(kx)
    kk = np.searchsorted(kx, ii)

    Hd = np.zeros((P * 6, P * 6))
    vd = np.zeros(P * 6)
    Ed = np.zeros((P * 6, M * HW))
    Cd = np.zeros((M, HW))
    wd = np.zeros((M, HW))
    Hii, Hij, Hji, Hjj = [np.asarray(h) for h in Hb]
    vi, vj = [np.asarray(v) for v in vb]
    Ei = np.asarray(Ei)
    Ej = np.asarray(Ej)
    Ck = np.asarray(Ck)
    wk = np.asarray(wk)
    for n in range(N):
        pi, pj, k = ii[n] - t0, jj[n] - t0, kk[n]
        for (a, b, Hblk) in [(pi, pi, Hii[n]), (pi, pj, Hij[n]),
                             (pj, pi, Hji[n]), (pj, pj, Hjj[n])]:
            if 0 <= a < P and 0 <= b < P:
                Hd[a * 6:(a + 1) * 6, b * 6:(b + 1) * 6] += Hblk
        if 0 <= pi < P:
            vd[pi * 6:(pi + 1) * 6] += vi[n]
            Ed[pi * 6:(pi + 1) * 6, k * HW:(k + 1) * HW] += Ei[n]
        if 0 <= pj < P:
            vd[pj * 6:(pj + 1) * 6] += vj[n]
            Ed[pj * 6:(pj + 1) * 6, k * HW:(k + 1) * HW] += Ej[n]
        Cd[k] += Ck[n]
        wd[k] += wk[n]
    Cd = Cd + 1e-3
    Q = (1.0 / Cd).reshape(-1)
    S = Hd - Ed @ (Q[:, None] * Ed.T)
    rhs = vd - Ed @ (Q * wd.reshape(-1))
    # CUDA damping order: damp (A − S)
    S[np.arange(P * 6), np.arange(P * 6)] += 0.1 + 1e-4 * np.diag(S)
    dx_dn = np.linalg.solve(S, rhs)
    dz_dn = Q * (wd.reshape(-1) - Ed.T @ dx_dn)

    np.testing.assert_allclose(np.asarray(dx_sp).reshape(-1), dx_dn,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dz_sp[:M]).reshape(-1), dz_dn,
                               atol=1e-3, rtol=1e-3)


def test_scale_shift_recovers_prior_alignment():
    """With informative mono prior, stage-2 pulls disps toward w·mono+q."""
    poses_gt, disps_gt, intr, ii, jj, target, weight = make_scene(seed=2)
    P, H, W = disps_gt.shape
    true_scale, true_shift = 2.0, 0.1
    mono = (disps_gt - true_shift) / true_scale
    key = jax.random.PRNGKey(11)
    disps0 = jnp.clip(disps_gt + 0.2 * jax.random.normal(key, (P, H, W)), 0.05, None)
    scales = jnp.ones(P)
    shifts = jnp.zeros(P)
    vmask = jnp.ones((P, H, W), bool)

    plan = ba.make_edge_plan(ii, jj, 1, P, edge_bucket=8, depth_bucket=4,
                             group_bucket=4, pose_bucket=4)
    eta = jnp.full((plan.M, H, W), 1e-4)

    def resid(disps, scales, shifts):
        r = disps - (scales[:, None, None] * mono + shifts[:, None, None])
        return float(jnp.abs(r).mean())

    r0 = resid(disps0, scales, shifts)
    disps, scales, shifts = disps0, scales, shifts
    for _ in range(10):
        disps, scales, shifts = ba.ba_scale_shift(
            poses_gt, disps, intr, target, weight, eta, mono,
            scales, shifts, vmask, plan, iters=2)
    r1 = resid(disps, scales, shifts)
    assert np.isfinite(r1) and r1 < 0.5 * r0, (r0, r1)


def test_align_scale_and_shift_exact():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(2, 6, 8).astype(np.float32) + 0.5)
    target = 1.8 * pred + 0.3
    w = jnp.ones_like(pred)
    s, t, e = ba.align_scale_and_shift(pred, target, w)
    np.testing.assert_allclose(np.asarray(s), 1.8, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 0.3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-4)


def test_align_scale_and_shift_degenerate_masks():
    """Reference common.py:97-101 semantics: det <= 0 (all-invalid mask
    or constant prediction) returns zeros, never NaN — NaN here would
    poison the tracker's depth_scale/depth_shift state."""
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.rand(2, 6, 8).astype(np.float32) + 0.5)
    target = 2.0 * pred + 0.1
    # frame 0: all-invalid mask; frame 1: constant prediction
    w = jnp.asarray(np.stack([np.zeros((6, 8)), np.ones((6, 8))])
                    .astype(np.float32))
    pred_c = pred.at[1].set(0.7)
    s, t, e = ba.align_scale_and_shift(pred_c, target, w)
    assert np.isfinite(np.asarray(s)).all()
    assert np.isfinite(np.asarray(t)).all()
    assert np.isfinite(np.asarray(e)).all()
    np.testing.assert_allclose(np.asarray(s), 0.0)
    np.testing.assert_allclose(np.asarray(t), 0.0)


def test_schur_solve_matches_dense_solve():
    """chol.py:72-98 parity on a random PSD system."""
    rng = np.random.RandomState(3)
    B, P, M, D, HW = 1, 3, 3, 6, 16
    J = rng.randn(B, P * D + M * HW, P * D + M * HW) * 0.1
    A = J @ J.transpose(0, 2, 1) + 0.5 * np.eye(P * D + M * HW)
    # force the depth-depth block diagonal
    Czz = np.diag(np.diag(A[0, P * D:, P * D:]))
    Hd = A[:, :P * D, :P * D]
    Ed = A[:, :P * D, P * D:]
    v = rng.randn(B, P * D)
    w = rng.randn(B, M * HW)

    H5 = Hd.reshape(B, P, D, P, D).transpose(0, 1, 3, 2, 4)
    E5 = Ed.reshape(B, P, D, M, HW).transpose(0, 1, 3, 2, 4)
    C = np.diag(Czz).reshape(B, M, HW)
    dx, dz = ba.schur_solve(jnp.asarray(H5, jnp.float32), jnp.asarray(E5, jnp.float32),
                            jnp.asarray(C, jnp.float32), jnp.asarray(v.reshape(B, P, D), jnp.float32),
                            jnp.asarray(w.reshape(B, M, HW), jnp.float32), ep=0.1, lm=1e-4)
    # dense solve of the damped full system
    Hd_damped = Hd.copy()
    Hd_damped[0][np.arange(P * D), np.arange(P * D)] += 0.1 + 1e-4 * np.diag(Hd[0])
    K = np.block([[Hd_damped[0], Ed[0]], [Ed[0].T, Czz]])
    sol = np.linalg.solve(K, np.concatenate([v[0], w[0]]))
    np.testing.assert_allclose(np.asarray(dx).reshape(-1), sol[:P * D], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dz).reshape(-1), sol[P * D:], atol=1e-3, rtol=1e-3)
