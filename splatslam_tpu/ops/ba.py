"""Dense bundle adjustment (DBA) and the DSPO layer, fully on-chip in XLA.

TPU-native re-design of the reference's split solver stack:
  * stage-1 "pose_depth" DBA  — reference droid_kernels.cu:1314-1437 (CUDA
    Hessian assembly + CPU Eigen float64 Cholesky) and geom/ba.py:48-135,
  * stage-2 "depth_scale" BA  — reference geom/ba.py:141-230
    (BA_with_scale_shift, eq. 17 of the Splat-SLAM paper),
  * motion-only BA            — reference geom/ba.py:237-285 (MoBA),
  * Schur / block solvers     — reference geom/chol.py:58-98.

Design deltas (the TPU wins):
  * The whole damped Schur system solves on-chip in fp32: the pose system is
    at most (P·6)² with P ≤ buffer — a trivially MXU-sized dense Cholesky —
    so there is no CPU round-trip per Gauss-Newton iteration (the reference
    ships the pose Hessian to Eigen on the CPU every iteration,
    droid_kernels.cu:1377-1407).
  * The pose-depth coupling matrix E is never materialized as the reference
    torch path's dense (P·6, M·HW) matrix. We exploit its sparsity exactly
    like the CUDA schur_block does, but with static shapes: per-edge 6×HW
    blocks are grouped per depth-frame (host-precomputed index plan) and
    S = E Q Eᵀ becomes batched [D·6, HW] @ [HW, D·6] matmuls on the MXU,
    streamed over depth-frame chunks to bound VMEM/HBM pressure.
  * Stage-2 (disp, scale, shift) decouples per keyframe once poses are
    frozen — the reference materializes a block-diagonal (M·2, M·HW) system
    (geom/ba.py:205-218); we solve M independent 2×2 Schur systems instead.

All jitted functions have static shapes; the host builds an `EdgePlan`
(padded index arrays, registered as a pytree) per edge-set shape bucket, so
recompilation happens only when a shape bucket is first seen.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import lie
from . import projective as pops


# ---------------------------------------------------------------------------
# host-side edge planning (static-shape bucketing)
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geom_bucket(x: int, base: int) -> int:
    """Smallest base·2^k ≥ x — geometric shape buckets keep the number of
    distinct compiled programs logarithmic in problem size."""
    b = base
    while b < x:
        b *= 2
    return b


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgePlan:
    """Padded, device-ready index arrays describing a factor-graph edge set.

    Built on host per BA call; array *shapes* are bucketed so the jitted BA
    kernel compiles once per bucket. Mirrors the CUDA ba bookkeeping
    (droid_kernels.cu:1338-1346: kx = unique(cat(arange(t0,t1), ii))).
    """
    # dynamic (traced) fields
    ii: jnp.ndarray          # (Np,) source frame index, 0 padding
    jj: jnp.ndarray          # (Np,) target frame index, 0 padding
    kk: jnp.ndarray          # (Np,) index of ii[n] within kx, 0 for padding
    kx: jnp.ndarray          # (M,)  depth-frame indices, repeats-last padding
    pi: jnp.ndarray          # (Np,) ii - t0 (pose slot, may be <0 = fixed)
    pj: jnp.ndarray          # (Np,) jj - t0
    edge_valid: jnp.ndarray  # (Np,) bool
    kx_valid: jnp.ndarray    # (M,) bool
    grp_edge: jnp.ndarray    # (M, D) edge ids contributing Ej to frame k, -1 pad
    t0: jnp.ndarray          # () int32
    # static metadata (shape buckets only — no per-value statics, they
    # would retrigger compilation through the pytree treedef)
    M: int = dataclasses.field(metadata=dict(static=True))
    P: int = dataclasses.field(metadata=dict(static=True))
    D: int = dataclasses.field(metadata=dict(static=True))


def make_edge_plan(ii: np.ndarray, jj: np.ndarray, t0: int, t1: int,
                   edge_bucket: int = 32, depth_bucket: int = 8,
                   group_bucket: int = 8, pose_bucket: int = 8,
                   valid=None) -> EdgePlan:
    """Build the padded index plan for an edge set on the host.

    `valid` (bool, aligned with ii) marks real edges; rows with
    valid=False are in-place padding (used to keep the active-edge block
    at a fixed offset across calls — see FactorGraph.update_rounds).
    Invalid rows contribute nothing: BA masks every per-edge term with
    plan.edge_valid.
    """
    ii = np.asarray(ii, dtype=np.int32).reshape(-1)
    jj = np.asarray(jj, dtype=np.int32).reshape(-1)
    n = ii.shape[0]
    if valid is None:
        valid = np.ones(n, bool)
    valid = np.asarray(valid, bool).reshape(-1)
    kx = np.unique(np.concatenate([np.arange(t0, t1, dtype=np.int32),
                                   ii[valid]]))
    m = kx.shape[0]
    kk = np.searchsorted(kx, np.clip(ii, kx[0] if m else 0,
                                     kx[-1] if m else 0)).astype(np.int32)
    kk = np.clip(kk, 0, max(m - 1, 0))

    Np = _geom_bucket(max(n, 1), edge_bucket)
    M = _geom_bucket(max(m, 1), depth_bucket)
    P = _geom_bucket(max(t1 - t0, 1), pose_bucket)

    kk_v = kk[valid]
    counts = np.bincount(kk_v, minlength=m) if kk_v.size else \
        np.zeros(m, np.int64)
    d = int(counts.max()) if kk_v.size else 1
    D = _geom_bucket(max(d, 1), group_bucket)
    grp = -np.ones((M, D), dtype=np.int32)
    fill = np.zeros(m, dtype=np.int32)
    for e_idx, (k, v) in enumerate(zip(kk, valid)):
        if v:
            grp[k, fill[k]] = e_idx
            fill[k] += 1

    pad = Np - n
    ii_p = np.concatenate([ii, np.zeros(pad, np.int32)])
    jj_p = np.concatenate([jj, np.zeros(pad, np.int32)])
    kk_p = np.concatenate([kk, np.zeros(pad, np.int32)])
    kx_p = np.concatenate([kx, np.full(M - m, kx[-1] if m else 0, np.int32)])
    valid_p = np.concatenate([valid, np.zeros(pad, bool)])

    return EdgePlan(
        ii=jnp.asarray(ii_p), jj=jnp.asarray(jj_p), kk=jnp.asarray(kk_p),
        kx=jnp.asarray(kx_p),
        pi=jnp.asarray(ii_p - t0), pj=jnp.asarray(jj_p - t0),
        edge_valid=jnp.asarray(valid_p),
        kx_valid=jnp.asarray(np.arange(M) < m),
        grp_edge=jnp.asarray(grp),
        t0=jnp.asarray(np.asarray(t0, np.int32)),  # 0-d array: no convert op
        M=int(M), P=int(P), D=int(D),
    )


# ---------------------------------------------------------------------------
# damped Cholesky with graceful failure (reference chol.py:20-56 semantics)
# ---------------------------------------------------------------------------

def _damp(A: jnp.ndarray, ep: float, lm: float) -> jnp.ndarray:
    """diag(A) ← diag(A)·(1+lm) + ep (droid_kernels.cu:1197 / chol.py:62)."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    return A + (ep + lm * diag)[..., :, None] * eye


def _chol_solve_core(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, jnp.zeros_like(x))


def solve_damped(A: jnp.ndarray, b: jnp.ndarray, ep: float, lm: float):
    """Damped PSD solve; returns zeros instead of crashing on failure."""
    return _chol_solve_core(_damp(A, ep, lm), b)


def block_solve(H: jnp.ndarray, v: jnp.ndarray, ep: float = 0.1,
                lm: float = 1e-4) -> jnp.ndarray:
    """Solve block normal equations (reference chol.py:58-69).

    H: (B, N, N, D, D), v: (B, N, D) → (B, N, D).
    """
    B, N, _, D, _ = H.shape
    Hd = H.transpose(0, 1, 3, 2, 4).reshape(B, N * D, N * D)
    vd = v.reshape(B, N * D, 1)
    x = solve_damped(Hd, vd, ep, lm)
    return x.reshape(B, N, D)


def schur_solve(H, E, C, v, w, ep: float = 0.1, lm: float = 1e-4):
    """Dense Schur-complement solve (reference chol.py:72-98).

    H: (B,P,P,D,D), E: (B,P,M,D,HW), C,w: (B,M,HW), v: (B,P,D).
    Kept for parity/tests; production paths use the sparse-E variants below.
    """
    B, P, M, D, HW = E.shape
    Hd = H.transpose(0, 1, 3, 2, 4).reshape(B, P * D, P * D)
    Ed = E.transpose(0, 1, 3, 2, 4).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW, 1)
    Hd = _damp(Hd, ep, lm)
    vd = v.reshape(B, P * D, 1)
    wd = w.reshape(B, M * HW, 1)
    Et = Ed.transpose(0, 2, 1)
    S = Hd - Ed @ (Q * Et)
    rhs = vd - Ed @ (Q * wd)
    dx = _chol_solve_core(S, rhs)
    dz = Q * (wd - Et @ dx)
    return dx.reshape(B, P, D), dz.reshape(B, M, HW)


# ---------------------------------------------------------------------------
# stage-1 DBA: pose + per-pixel disparity (CUDA ba_cuda parity, on-chip)
# ---------------------------------------------------------------------------

_EDGE_CHUNK = 64    # edges per Jacobian chunk (bounds transient memory)
_FRAME_CHUNK = 32   # depth frames per Schur-assembly chunk


def _pad_edges(x, Np):
    """Pad a per-edge array to the plan's bucketed edge count.

    More rows than the plan has means the caller's target/weight are out
    of sync with the (possibly filtered) edge list the plan was built
    from — silent truncation would misalign every row, so fail loud."""
    n = x.shape[0]
    if n > Np:
        raise ValueError(
            f"per-edge array has {n} rows but the plan is bucketed to "
            f"{Np} — target/weight out of sync with the plan's edges")
    if n == Np:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((Np - n,) + x.shape[1:], x.dtype)], axis=0)


def _edge_terms(poses, disps, intrinsics, target, weight, ii, jj):
    """Per-edge residual/weight/Jacobian reductions, chunked over edges.

    poses (P_all,7), disps (P_all,h,w), intrinsics (4,), target/weight
    (N,h,w,2). Returns per-edge blocks with HW flattened last:
    (Hii,Hij,Hji,Hjj) (N,6,6), (vi,vj) (N,6), (Ei,Ej) (N,6,HW),
    Ck (N,HW), wk (N,HW).
    """
    N = ii.shape[0]
    target = _pad_edges(target, N)
    weight = _pad_edges(weight, N)
    H, W = disps.shape[-2:]
    HW = H * W
    intr = jnp.broadcast_to(intrinsics, (poses.shape[0], 4))

    chunk = min(_EDGE_CHUNK, N)
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    ii_c = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)]).reshape(n_chunks, chunk)
    jj_c = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)]).reshape(n_chunks, chunk)
    tw = jnp.concatenate(
        [jnp.stack([target, weight], 1),
         jnp.zeros((pad, 2, H, W, 2), target.dtype)]
    ).reshape(n_chunks, chunk, 2, H, W, 2)

    def one_chunk(args):
        iic, jjc, twc = args
        tgt = twc[:, 0]
        wgt = twc[:, 1]
        coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
            poses[None], disps[None], intr[None], iic, jjc, jacobian=True)
        r = (tgt[None] - coords).reshape(chunk, HW, 2)
        w = (0.001 * valid * wgt[None]).reshape(chunk, HW, 2)
        Ji = Ji.reshape(chunk, HW, 2, 6)
        Jj = Jj.reshape(chunk, HW, 2, 6)
        Jz = Jz.reshape(chunk, HW, 2)
        wJi = w[..., None] * Ji
        wJj = w[..., None] * Jj
        Hii = jnp.einsum("nhca,nhcb->nab", wJi, Ji)
        Hij = jnp.einsum("nhca,nhcb->nab", wJi, Jj)
        Hji = jnp.einsum("nhca,nhcb->nab", wJj, Ji)
        Hjj = jnp.einsum("nhca,nhcb->nab", wJj, Jj)
        vi = jnp.einsum("nhca,nhc->na", wJi, r)
        vj = jnp.einsum("nhca,nhc->na", wJj, r)
        Ei = jnp.einsum("nhca,nhc->nah", wJi, Jz)
        Ej = jnp.einsum("nhca,nhc->nah", wJj, Jz)
        wk = jnp.sum(w * r * Jz, axis=-1)
        Ck = jnp.sum(w * Jz * Jz, axis=-1)
        return (Hii, Hij, Hji, Hjj), (vi, vj), (Ei, Ej), Ck, wk

    out = jax.lax.map(one_chunk, (ii_c, jj_c, tw))
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:N], out)
    return flat


def _scatter_pose_system(Hblocks, vblocks, pi, pj, P):
    """Assemble dense (P·6, P·6) pose Hessian + rhs from per-edge blocks."""
    Hii, Hij, Hji, Hjj = Hblocks
    vi, vj = vblocks

    def blk_idx(a, b):
        ok = (a >= 0) & (a < P) & (b >= 0) & (b < P)
        return jnp.where(ok, a * P + b, P * P)

    idx = jnp.concatenate([blk_idx(pi, pi), blk_idx(pi, pj),
                           blk_idx(pj, pi), blk_idx(pj, pj)])
    blocks = jnp.concatenate([Hii, Hij, Hji, Hjj], axis=0)
    Hflat = jax.ops.segment_sum(blocks, idx, num_segments=P * P + 1)[:-1]
    Hmat = Hflat.reshape(P, P, 6, 6).transpose(0, 2, 1, 3).reshape(P * 6, P * 6)

    def v_idx(a):
        return jnp.where((a >= 0) & (a < P), a, P)

    vidx = jnp.concatenate([v_idx(pi), v_idx(pj)])
    vcat = jnp.concatenate([vi, vj], axis=0)
    v = jax.ops.segment_sum(vcat, vidx, num_segments=P + 1)[:-1]
    return Hmat, v.reshape(P * 6)


def _dba_iteration(poses, disps, intrinsics, target, weight, eta,
                   sensor_disps, plan: EdgePlan, lm, ep, motion_only,
                   alpha: float = 0.05):
    """One Gauss-Newton iteration of stage-1 DBA (ba_cuda:1358-1434 parity)."""
    P, M, D = plan.P, plan.M, plan.D
    H_img, W_img = disps.shape[-2:]
    HW = H_img * W_img
    ii = jnp.where(plan.edge_valid, plan.ii, 0)
    jj = jnp.where(plan.edge_valid, plan.jj, 0)

    Hb, vb, (Ei, Ej), Ck, wk = _edge_terms(
        poses, disps, intrinsics, target, weight, ii, jj)

    ev = plan.edge_valid.astype(Ei.dtype)
    Hb = tuple(h * ev[:, None, None] for h in Hb)
    vb = tuple(v * ev[:, None] for v in vb)
    Ei = Ei * ev[:, None, None]
    Ej = Ej * ev[:, None, None]
    Ck = Ck * ev[:, None]
    wk = wk * ev[:, None]

    Hmat, v = _scatter_pose_system(Hb, vb, plan.pi, plan.pj, P)

    if motion_only:
        dx = solve_damped(Hmat, v[:, None], ep, lm)[:, 0]
        return dx.reshape(P, 6), None

    # depth diagonal + rhs per depth frame (C, w) — ba_cuda:1395-1400
    kseg = jnp.where(plan.edge_valid, plan.kk, M)
    C = jax.ops.segment_sum(Ck, kseg, num_segments=M + 1)[:-1]
    w = jax.ops.segment_sum(wk, kseg, num_segments=M + 1)[:-1]
    sens = sensor_disps[plan.kx].reshape(M, HW)
    msk = (sens > 0).astype(C.dtype)
    disps_k = disps[plan.kx].reshape(M, HW)
    C = C + msk * alpha + (1.0 - msk) * eta.reshape(M, HW)
    w = w - msk * alpha * (disps_k - sens)
    # zero-coverage rows (e.g. bucketed padding with eta=0) must yield
    # dz=0, not inf*0=NaN
    Q = jnp.where(C != 0, 1.0 / jnp.where(C != 0, C, 1.0), 0.0)  # (M,HW)

    # accumulated ii-side coupling block per depth frame (pose == depth frame)
    Ei_acc = jax.ops.segment_sum(Ei, kseg, num_segments=M + 1)[:-1]  # (M,6,HW)
    pk = plan.kx - plan.t0                            # pose slot of depth frame
    Dp = D + 1

    # Stream the Schur products over depth-frame chunks: for each depth frame
    # its contributor blocks are [slot0 = Ei_acc, slots 1..D = that frame's
    # outgoing-edge Ej blocks]; S += A Q Aᵀ scattered by contributor poses.
    mc = min(_FRAME_CHUNK, M)
    n_mchunks = (M + mc - 1) // mc
    Mp = n_mchunks * mc

    def padM(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((Mp - M,) + x.shape[1:], fill, x.dtype)], 0)

    grp_c = padM(plan.grp_edge, -1).reshape(n_mchunks, mc, D)
    Ei_acc_c = padM(Ei_acc).reshape(n_mchunks, mc, 6, HW)
    pk_c = padM(pk, -1).reshape(n_mchunks, mc)
    Q_c = padM(Q).reshape(n_mchunks, mc, HW)
    w_c = padM(w).reshape(n_mchunks, mc, HW)

    def schur_chunk(carry, args):
        S_acc, EQw_acc = carry
        grp, Ei_a, pkc, Qc, wc = args
        g_ok = grp >= 0
        Ej_g = Ej[jnp.where(g_ok, grp, 0)] * g_ok[..., None, None]
        A = jnp.concatenate([Ei_a[:, None], Ej_g], axis=1)     # (mc,Dp,6,HW)
        p_of = jnp.concatenate(
            [pkc[:, None], jnp.where(g_ok, plan.pj[jnp.where(g_ok, grp, 0)], -1)],
            axis=1)                                            # (mc,Dp)
        p_ok = (p_of >= 0) & (p_of < P)
        A = A * p_ok[..., None, None]
        AQ = A * Qc[:, None, None, :]
        Sblk = jnp.einsum("mdah,mebh->mdaeb", AQ, A)           # (mc,Dp,6,Dp,6)
        pa = jnp.broadcast_to(p_of[:, :, None], (mc, Dp, Dp))
        pb = jnp.broadcast_to(p_of[:, None, :], (mc, Dp, Dp))
        ok = p_ok[:, :, None] & p_ok[:, None, :]
        sidx = jnp.where(ok, pa * P + pb, P * P).reshape(-1)
        S_acc = S_acc + jax.ops.segment_sum(
            Sblk.transpose(0, 1, 3, 2, 4).reshape(-1, 6, 6), sidx,
            num_segments=P * P + 1)[:-1]
        EQw_blk = jnp.einsum("mdah,mh->mda", AQ, wc)
        pidx = jnp.where(p_ok, p_of, P).reshape(-1)
        EQw_acc = EQw_acc + jax.ops.segment_sum(
            EQw_blk.reshape(-1, 6), pidx, num_segments=P + 1)[:-1]
        return (S_acc, EQw_acc), None

    init = (jnp.zeros((P * P, 6, 6), Ei.dtype), jnp.zeros((P, 6), Ei.dtype))
    (Sflat, EQw), _ = jax.lax.scan(
        schur_chunk, init, (grp_c, Ei_acc_c, pk_c, Q_c, w_c))
    S = Sflat.reshape(P, P, 6, 6).transpose(0, 2, 1, 3).reshape(P * 6, P * 6)

    dx = solve_damped(Hmat - S, (v - EQw.reshape(P * 6))[:, None], ep, lm)[:, 0]
    dx_blocks = dx.reshape(P, 6)

    # dz = Q (w − Eᵀ dx): per depth frame, Eᵀdx = Ei_accᵀ dx[pk] + Σ Ejᵀ dx[pj]
    def dz_chunk(_, args):
        grp, Ei_a, pkc, Qc, wc = args
        g_ok = grp >= 0
        Ej_g = Ej[jnp.where(g_ok, grp, 0)] * g_ok[..., None, None]
        A = jnp.concatenate([Ei_a[:, None], Ej_g], axis=1)
        p_of = jnp.concatenate(
            [pkc[:, None], jnp.where(g_ok, plan.pj[jnp.where(g_ok, grp, 0)], -1)],
            axis=1)
        p_ok = (p_of >= 0) & (p_of < P)
        dxg = dx_blocks[jnp.where(p_ok, p_of, 0)] * p_ok[..., None]
        Etdx = jnp.einsum("mdah,mda->mh", A, dxg)
        return None, Qc * (wc - Etdx)

    _, dz_c = jax.lax.scan(dz_chunk, None,
                           (grp_c, Ei_acc_c, pk_c, Q_c, w_c))
    dz = dz_c.reshape(Mp, HW)[:M]
    return dx_blocks, dz


@partial(jax.jit, static_argnames=("iters", "motion_only"))
def dba(poses, disps, intrinsics, target, weight, eta, sensor_disps,
        plan: EdgePlan, iters: int = 2, lm: float = 1e-4, ep: float = 0.1,
        motion_only: bool = False):
    """Stage-1 DBA / motion-only BA: `iters` Gauss-Newton steps, on-chip.

    poses (P_all,7) SE3 w2c; disps (P_all,h,w); intrinsics (4,) at 1/8 res;
    target/weight (N,h,w,2); eta (M,h,w) per-depth-frame damping;
    sensor_disps (P_all,h,w) (pass zeros to disable the prior term like
    depth_video.py:231 does). Returns updated (poses, disps): pose update is
    exp(dx) ∘ pose for frames [t0, t0+P), disparity update disps[kx] += dz
    clamped ≥ 1e-5 (depth_video.py:233).
    """
    H_img, W_img = disps.shape[-2:]

    def body(_, state):
        poses, disps = state
        dx, dz = _dba_iteration(poses, disps, intrinsics, target, weight,
                                eta, sensor_disps, plan, lm, ep, motion_only)
        pose_idx = plan.t0 + jnp.arange(plan.P)
        new_p = lie.retr(poses[pose_idx], dx.astype(poses.dtype))
        poses = poses.at[pose_idx].set(lie.normalize(new_p))
        if dz is not None:
            # Padded kx rows repeat kx[-1]; a duplicate-index .set would
            # nondeterministically clobber that frame's update. Scatter-ADD
            # the masked increments (padding contributes exactly 0), then
            # clip only the frames the plan actually touches.
            dz_img = dz.reshape(plan.M, H_img, W_img)
            dz_img = dz_img * plan.kx_valid[:, None, None]
            delta = jnp.zeros_like(disps).at[plan.kx].add(
                dz_img.astype(disps.dtype))
            touched = jnp.zeros((disps.shape[0],), disps.dtype).at[
                plan.kx].add(plan.kx_valid.astype(disps.dtype)) > 0
            upd = jnp.clip(disps + delta, 1e-5, None)
            disps = jnp.where(touched[:, None, None], upd, disps)
        return poses, disps

    return jax.lax.fori_loop(0, iters, body, (poses, disps))


# ---------------------------------------------------------------------------
# stage-2 DSPO: joint disparity / scale / shift (eq. 17), per-frame Schur
# ---------------------------------------------------------------------------

def bad_mono_frames(mono_disps, disps, valid_small, mono_thres):
    """Per-frame bad-mono-prior detection (depth_video.py:256-276 parity).

    A frame's mono prior is 'bad' when the closed-form scale/shift fit of
    mono→estimated disparity has relative error > mono_thres, a negative
    scale, a non-finite error, or <50% multiview-valid pixels. Shared by
    the host DSPO path and the fused tracking-rounds kernel so both drop
    the same edges. Returns (B,) bool."""
    sc, _, err = align_scale_and_shift(mono_disps, disps, valid_small)
    return bad_mono_from_fit(sc, err, disps, valid_small, mono_thres)


@jax.jit
def bad_mono_from_fit(sc, err, disps, valid_small, mono_thres):
    """bad_mono_frames when the caller already has the closed-form fit
    (the host DSPO path computes align_scale_and_shift anyway — reusing
    it halves the fit work per stage-2 dispatch)."""
    avg = disps.mean(axis=(-2, -1))
    vfrac = valid_small.astype(disps.dtype).mean(axis=(-2, -1))
    return ((err / jnp.clip(avg, 1e-8) > mono_thres)
            | ~jnp.isfinite(err) | (sc < 0) | (vfrac < 0.5))


def _scale_shift_iteration(poses, disps, intrinsics, target, weight, eta,
                           mono_disps, scales, shifts, valid_depth_mask,
                           plan: EdgePlan, lm=1e-4, ep=0.1, alpha=0.01,
                           kx_mask=None):
    """One GN iteration of stage-2 DSPO (core shared by ba_scale_shift
    and the fused tracking rounds kernel). kx_mask (M,) bool, optional:
    depth frames whose updates apply (frames with all edges dropped by
    the mono_thres filter are frozen, matching the reference's rebuilt
    edge plan)."""
    H_img, W_img = disps.shape[-2:]
    HW = H_img * W_img
    M = plan.M
    sqrt_a = jnp.sqrt(jnp.asarray(alpha, disps.dtype))
    ii = jnp.where(plan.edge_valid, plan.ii, 0)
    jj = jnp.where(plan.edge_valid, plan.jj, 0)
    _, _, _, Ck, wk = _edge_terms(
        poses, disps, intrinsics, target, weight, ii, jj)
    ev = plan.edge_valid.astype(Ck.dtype)
    Ck = Ck * ev[:, None]
    wk = wk * ev[:, None]
    kseg = jnp.where(plan.edge_valid, plan.kk, M)
    C_proj = jax.ops.segment_sum(Ck, kseg, num_segments=M + 1)[:-1]
    # net sign matches stage-1: +Σwk per depth frame (the former
    # segment_sum(-wk) was immediately re-negated at the rhs assembly —
    # a confusing double negation)
    w_proj = jax.ops.segment_sum(wk, kseg, num_segments=M + 1)[:-1]

    mono = mono_disps[plan.kx].reshape(M, HW)
    d_k = disps[plan.kx].reshape(M, HW)
    vmask = valid_depth_mask[plan.kx].reshape(M, HW)
    sc = scales[plan.kx][:, None]
    sh = shifts[plan.kx][:, None]

    invalid = mono < 1e-6
    # residual uses the scalar sqrt(alpha); Jacobians get the 10× boost
    # on multiview-consistent pixels (geom/ba.py:169-183, faithfully —
    # including the intentionally mismatched residual/Jacobian scaling)
    r_d = sqrt_a * (d_k - (sc * mono + sh))
    sa = jnp.where(vmask, sqrt_a * 10.0, sqrt_a)
    J_d = jnp.where(invalid & vmask, 0.0, sa)
    J_s = jnp.where(invalid, 0.0, -mono * sa)
    J_q = jnp.where(invalid, 0.0, -sa)

    H00 = jnp.sum(J_s * J_s, -1)
    H01 = jnp.sum(J_s * J_q, -1)
    H11 = jnp.sum(J_q * J_q, -1)
    u0 = -jnp.sum(J_s * r_d, -1)
    u1 = -jnp.sum(J_q * r_d, -1)

    C = C_proj + J_d * J_d + eta.reshape(M, HW)
    # zero-coverage pixels (no incident edges, mono invalid, zero eta
    # row) must yield dz=0 at THAT pixel — an unguarded 1/0 makes the
    # frame's fin check mask out the whole frame's update (stage-1 has
    # the same guard)
    Q = jnp.where(C != 0, 1.0 / jnp.where(C != 0, C, 1.0), 0.0)
    w = w_proj - J_d * r_d

    E0 = J_s * J_d                                # rows of E (2,HW) per k
    E1 = J_q * J_d

    # damp H before the Schur subtraction (torch chol.py:81 order)
    H00d = H00 + ep + lm * H00
    H11d = H11 + ep + lm * H11

    S00 = H00d - jnp.sum(E0 * Q * E0, -1)
    S01 = H01 - jnp.sum(E0 * Q * E1, -1)
    S11 = H11d - jnp.sum(E1 * Q * E1, -1)
    r0 = u0 - jnp.sum(E0 * Q * w, -1)
    r1 = u1 - jnp.sum(E1 * Q * w, -1)

    det = S00 * S11 - S01 * S01
    safe = jnp.abs(det) > 1e-12
    det = jnp.where(safe, det, 1.0)
    dws = jnp.where(safe, (S11 * r0 - S01 * r1) / det, 0.0)
    dq = jnp.where(safe, (-S01 * r0 + S00 * r1) / det, 0.0)

    dz = Q * (w - (E0 * dws[:, None] + E1 * dq[:, None]))
    fin = jnp.isfinite(dz).all(-1) & jnp.isfinite(dws) & jnp.isfinite(dq)
    ok = fin & plan.kx_valid
    if kx_mask is not None:
        ok = ok & kx_mask
    dz = jnp.where(ok[:, None], dz, 0.0)
    dws = jnp.where(ok, dws, 0.0)
    dq = jnp.where(ok, dq, 0.0)

    # Padded kx rows repeat kx[-1]; a duplicate-index .set would clobber
    # that frame's update with unspecified ordering. Scatter-ADD the
    # masked post-clip increment instead (ok-masked rows add exactly 0,
    # so duplicates commute): old + (clip(old+dz) - old) == clip(old+dz).
    delta = jnp.where(ok[:, None],
                      jnp.clip(d_k + dz, 1e-5, None) - d_k,
                      0.0).reshape(M, H_img, W_img)
    disps = disps.at[plan.kx].add(delta)
    scales = scales.at[plan.kx].add(dws)
    shifts = shifts.at[plan.kx].add(dq)
    return disps, scales, shifts


@partial(jax.jit, static_argnames=("iters",))
def ba_scale_shift(poses, disps, intrinsics, target, weight, eta,
                   mono_disps, scales, shifts, valid_depth_mask,
                   plan: EdgePlan, iters: int = 1, lm: float = 1e-4,
                   ep: float = 0.1, alpha: float = 0.01):
    """Stage-2 of DSPO (reference geom/ba.py:141-230), poses frozen.

    Optimizes disparities plus per-frame mono-prior scale w and shift q with
    residual  disps − (w·mono + q). The reference builds a dense
    block-diagonal (M·2 × M·HW) Schur system; the system decouples per
    keyframe, so we solve M independent 2×2 Schur complements.

    mono_disps (P_all,h,w); scales/shifts (P_all,); valid_depth_mask
    (P_all,h,w) bool (multiview-consistency mask at 1/8 res).
    Returns (disps, scales, shifts).
    """
    def body(_, state):
        disps_i, scales_i, shifts_i = state
        return _scale_shift_iteration(
            poses, disps_i, intrinsics, target, weight, eta, mono_disps,
            scales_i, shifts_i, valid_depth_mask, plan, lm, ep, alpha)

    return jax.lax.fori_loop(0, iters, body, (disps, scales, shifts))


# ---------------------------------------------------------------------------
# closed-form weighted scale/shift alignment (reference common.py:67-103)
# ---------------------------------------------------------------------------

def align_scale_and_shift(prediction, target, weights):
    """min Σ w·(s·pred + t − target)²; returns (scale, shift, avg_error).

    prediction/target/weights: (..., H, W) (weights may be bool).
    """
    w = weights.astype(prediction.dtype)
    a00 = jnp.sum(w * prediction * prediction, axis=(-2, -1))
    a01 = jnp.sum(w * prediction, axis=(-2, -1))
    a11 = jnp.sum(w, axis=(-2, -1))
    b0 = jnp.sum(w * prediction * target, axis=(-2, -1))
    b1 = jnp.sum(w * target, axis=(-2, -1))
    det = a00 * a11 - a01 * a01
    # degenerate masks (all-invalid frame, constant prediction) give
    # det == 0; the reference zeroes scale/shift there (common.py:97-101)
    # rather than emitting NaN into the tracker's scale/shift state
    ok = det > 0
    det_safe = jnp.where(ok, det, 1.0)
    scale = jnp.where(ok, (a11 * b0 - a01 * b1) / det_safe, 0.0)
    shift = jnp.where(ok, (-a01 * b0 + a00 * b1) / det_safe, 0.0)
    err = jnp.abs(scale[..., None, None] * prediction
                  + shift[..., None, None] - target)
    avg_error = jnp.sum(err * w, axis=(-2, -1)) / jnp.clip(a11, 1e-8)
    return scale, shift, avg_error
