"""Pinhole projective geometry with analytic Jacobians, in pure JAX.

TPU-native equivalent of the reference's
thirdparty/glorie_slam/geom/projective_ops.py (iproj/proj/actp/
projective_transform/induced_flow) — identical math and Jacobian
conventions (left-perturbation SE3 tangent [tau, phi]) so the DBA layer
built on top reproduces reference behaviour.

Everything is batched as (B, N, H, W, ...) where N is the number of factor
edges; functions are jit/vmap-safe with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel coordinate grid (ht, wd, 2) ordered (x, y)."""
    y = jnp.arange(ht, dtype=dtype)
    x = jnp.arange(wd, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # (ht, wd)
    return jnp.stack([xx, yy], axis=-1)


def iproj(disps: jnp.ndarray, intrinsics: jnp.ndarray, jacobian: bool = False):
    """Inverse pinhole projection to homogeneous points (x, y, 1, disp).

    disps: (B, N, H, W); intrinsics: (B, N, 4) as (fx, fy, cx, cy).
    Returns pts (B, N, H, W, 4) and optionally dpts/ddisp (same shape,
    nonzero only in the last channel) — reference geom/projective_ops.py:32.
    """
    B, N, H, W = disps.shape
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    grid = coords_grid(H, W, dtype=disps.dtype)
    x = grid[..., 0]
    y = grid[..., 1]
    X = (x - cx) / fx
    Y = (y - cy) / fy
    ones = jnp.ones_like(disps)
    pts = jnp.stack([X * ones, Y * ones, ones, disps], axis=-1)
    if jacobian:
        J = jnp.zeros_like(pts).at[..., 3].set(1.0)
        return pts, J
    return pts, None


def proj(Xs: jnp.ndarray, intrinsics: jnp.ndarray, jacobian: bool = False,
         return_depth: bool = False):
    """Pinhole projection of homogeneous points (B,N,H,W,4) → pixel coords.

    Matches reference geom/projective_ops.py:53 — including the Z-clamp of
    points closer than MIN_DEPTH/2 and the 2x4 projection Jacobian.
    """
    fx, fy, cx, cy = [intrinsics[..., i, None, None] for i in range(4)]
    X, Y, Z, D = Xs[..., 0], Xs[..., 1], Xs[..., 2], Xs[..., 3]
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)
    if jacobian:
        o = jnp.zeros_like(d)
        Jrow0 = jnp.stack([fx * d, o, -fx * X * d * d, o], axis=-1)
        Jrow1 = jnp.stack([o, fy * d, -fy * Y * d * d, o], axis=-1)
        proj_jac = jnp.stack([Jrow0, Jrow1], axis=-2)  # (B,N,H,W,2,4)
        return coords, proj_jac
    return coords, None


def actp(Gij: jnp.ndarray, X0: jnp.ndarray, jacobian: bool = False):
    """Apply per-edge SE3 (B, N, 7) to point maps (B, N, H, W, 4).

    Jacobian is wrt LEFT perturbation of Gij: rows of the 4x6 matrix follow
    reference geom/projective_ops.py:91-96.
    """
    X1 = lie.act(Gij[:, :, None, None, :], X0)
    if jacobian:
        X, Y, Z, d = X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3]
        o = jnp.zeros_like(d)
        Ja = jnp.stack(
            [
                d, o, o, o, Z, -Y,
                o, d, o, -Z, o, X,
                o, o, d, Y, -X, o,
                o, o, o, o, o, o,
            ],
            axis=-1,
        ).reshape(X1.shape[:-1] + (4, 6))
        return X1, Ja
    return X1, None


def projective_transform(poses: jnp.ndarray, depths: jnp.ndarray,
                         intrinsics: jnp.ndarray, ii: jnp.ndarray,
                         jj: jnp.ndarray, jacobian: bool = False,
                         return_depth: bool = False):
    """Map pixels of frames ii into frames jj (reference pops:110-139).

    poses: (B, P, 7) world-to-camera SE3; depths: (B, P, H, W) disparities;
    intrinsics: (B, P, 4); ii/jj: (N,) edge indices.

    Returns (coords, valid[, (Ji, Jj, Jz)]):
      coords (B,N,H,W,2|3), valid (B,N,H,W,1),
      Ji/Jj (B,N,H,W,2,6) pose Jacobians, Jz (B,N,H,W,2,1) disparity Jacobian.
    """
    X0, Jz = iproj(depths[:, ii], intrinsics[:, ii], jacobian=jacobian)

    # relative pose Gij = poses[jj] ∘ poses[ii]^-1; self-edges get a fixed
    # baseline like the reference (pops:119) to keep the system well-posed
    Gij = lie.mul(poses[:, jj], lie.inv(poses[:, ii]))
    self_edge = (ii == jj)[None, :, None]
    fixed = jnp.asarray([-0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=Gij.dtype)
    Gij = jnp.where(self_edge, fixed, Gij)

    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    x1, Jp = proj(X1, intrinsics[:, jj], jacobian=jacobian,
                  return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH))
    valid = valid.astype(x1.dtype)[..., None]

    if jacobian:
        Jj = Jp @ Ja                                     # (B,N,H,W,2,6)
        # dual-adjoint transport Ji = -(Jj @ Adj(Gij)) — shared helper
        # so the covector convention lives in one place (lie.adjT_apply)
        Ji = -lie.adjT_apply(Gij[:, :, None, None], Jj)
        Jz2 = lie.act(Gij[:, :, None, None, :], Jz)       # transform dX/dd
        Jz2 = (Jp @ Jz2[..., None])                       # (B,N,H,W,2,1)
        return x1, valid, (Ji, Jj, Jz2)

    return x1, valid


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (reference pops:141-152)."""
    H, W = disps.shape[-2:]
    coords0 = coords_grid(H, W, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
