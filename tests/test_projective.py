"""Projective-transform Jacobians validated against autodiff.

The analytic Ji/Jj/Jz must equal d(coords)/d(left-perturbation of pose_i /
pose_j) and d(coords)/d(disparity) — the same convention the reference DBA
assumes (thirdparty/glorie_slam/geom/projective_ops.py:110-139).
"""

import jax
import jax.numpy as jnp
import numpy as np

from splatslam_tpu.ops import lie, projective as pops


def _setup(seed=0, P=4, H=6, W=8):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, (P, 6)) * 0.2
    poses = lie.exp(xi)[None]                     # (1,P,7)
    disps = 0.5 + jax.random.uniform(k2, (1, P, H, W))
    intr = jnp.tile(jnp.asarray([[10.0, 11.0, W / 2, H / 2]]), (P, 1))[None]
    ii = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    jj = jnp.asarray([1, 2, 0], dtype=jnp.int32)
    return poses, disps, intr, ii, jj


def test_jacobians_match_autodiff():
    poses, disps, intr, ii, jj = _setup()
    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)

    def coords_of_eps(eps_i, eps_j, dz):
        pi = lie.retr(poses[0, ii], eps_i)        # left perturbation
        pj = lie.retr(poses[0, jj], eps_j)
        P = poses.shape[1]
        # rebuild a pose/disp table with the perturbed edge entries
        poses_pert = poses[0]
        disps_pert = disps[0]
        # evaluate the transform edge-by-edge to keep perturbations separate
        out = []
        for n in range(ii.shape[0]):
            ptab = poses_pert.at[ii[n]].set(pi[n]).at[jj[n]].set(pj[n])
            dtab = disps_pert.at[ii[n]].add(dz[n])
            c, _ = pops.projective_transform(
                ptab[None], dtab[None], intr, ii[n:n + 1], jj[n:n + 1])
            out.append(c[0, 0])
        return jnp.stack(out)

    N = ii.shape[0]
    H, W = disps.shape[2:]
    eps = jnp.zeros((N, 6))
    dz0 = jnp.zeros((N, H, W))

    # d/d eps_i
    Jad_i = jax.jacfwd(lambda e: coords_of_eps(e, eps, dz0))(eps)
    # Jad_i: (N,H,W,2, N,6) — take diagonal over edges
    Jad_i = jnp.stack([Jad_i[n, ..., n, :] for n in range(N)])
    v = np.asarray(valid[0])[..., 0] > 0
    np.testing.assert_allclose(
        np.asarray(Ji[0])[v], np.asarray(Jad_i)[v], atol=1e-3, rtol=1e-3)

    # d/d eps_j
    Jad_j = jax.jacfwd(lambda e: coords_of_eps(eps, e, dz0))(eps)
    Jad_j = jnp.stack([Jad_j[n, ..., n, :] for n in range(N)])
    np.testing.assert_allclose(
        np.asarray(Jj[0])[v], np.asarray(Jad_j)[v], atol=1e-3, rtol=1e-3)

    # d/d disparity (diagonal in pixels)
    Jad_z = jax.jacfwd(lambda z: coords_of_eps(eps, eps, z))(dz0)
    # (N,H,W,2, N,H,W) → per-pixel diagonal
    Jz_num = np.zeros((N, H, W, 2))
    Jad_z = np.asarray(Jad_z)
    for n in range(N):
        for y in range(H):
            for x in range(W):
                Jz_num[n, y, x] = Jad_z[n, y, x, :, n, y, x]
    np.testing.assert_allclose(
        np.asarray(Jz[0])[v][..., 0], Jz_num[v], atol=1e-3, rtol=1e-3)


def test_self_edge_uses_fixed_baseline():
    poses, disps, intr, _, _ = _setup()
    ii = jnp.asarray([1], dtype=jnp.int32)
    jj = jnp.asarray([1], dtype=jnp.int32)
    coords, valid = pops.projective_transform(poses, disps, intr, ii, jj)
    # with Gij = (t=[-0.1,0,0], q=I), coords shift left by 0.1*fx*disp
    grid = pops.coords_grid(disps.shape[2], disps.shape[3])
    expected_dx = -0.1 * 10.0 * np.asarray(disps[0, 1])
    got_dx = np.asarray(coords[0, 0, ..., 0]) - np.asarray(grid[..., 0])
    np.testing.assert_allclose(got_dx, expected_dx, atol=1e-4)


def test_induced_flow_zero_for_identity():
    P, H, W = 3, 6, 8
    poses = lie.identity((P,))[None]
    disps = jnp.ones((1, P, H, W)) * 0.7
    intr = jnp.tile(jnp.asarray([[10.0, 10.0, 4.0, 3.0]]), (P, 1))[None]
    ii = jnp.asarray([0], dtype=jnp.int32)
    jj = jnp.asarray([1], dtype=jnp.int32)
    flow, valid = pops.induced_flow(poses, disps, intr, ii, jj)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-5)
