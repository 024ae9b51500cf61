"""Factor graph: edge bookkeeping on host, one fused update kernel on device.

TPU-native re-design of the reference FactorGraph
(thirdparty/glorie_slam/factor_graph.py:23-476):

  * Edge sets (ii, jj, age) live in host numpy — they drive control flow
    (NMS, dedup, proximity proposals), which the reference also runs on
    CPU (factor_graph.py:337-397). Per-edge tensors (GRU hidden state,
    target flow, weights) live on device, padded to shape buckets.
  * The update operator — reproject → local correlation → ConvGRU →
    delta/weight heads → GraphAgg — is ONE jitted kernel
    (`_update_kernel`), chunked over edges so alt-corr transients stay
    VMEM-friendly. The reference's two code paths (precomputed volume
    frontend, alt-corr `update_lowmem` backend) collapse into one: we
    never materialize the O(N·HW²) correlation volume at all — the
    lookup window is computed on the fly (corr.alt_corr), which on TPU is
    MXU work instead of an HBM-bandwidth-bound gather over a ~GB volume.
  * Bundle adjustment is dispatched through DepthVideo.ba (the DSPO
    layer) exactly like factor_graph.py:265.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.droid_net import DroidNet
from ..ops import corr as corr_ops
from ..ops import projective as pops
from .depth_video import reproject_kernel, _pad_idx as _pad_idx_fg
from ..ops.ba import _geom_bucket

_NET_DTYPE = jnp.float32
_EDGE_BUCKET = 32
_KF_BUCKET = 8
_CORR_CHUNK = 8


def _round_up(x, m):
    return max(((x + m - 1) // m) * m, m)


# -- device edge pools: fixed-shape mutation kernels -------------------------

@partial(jax.jit, static_argnames=("new_bucket",))
def _pool_resize(buf, new_bucket: int):
    k = min(buf.shape[0], new_bucket)
    out = jnp.zeros((new_bucket,) + buf.shape[1:], buf.dtype)
    return out.at[:k].set(buf[:k])


@jax.jit
def _pool_write(buf, rows, start):
    """Write a padded row block into buf at (traced) offset start.
    Caller guarantees start + rows.shape[0] <= buf.shape[0] (else XLA
    clamps the offset and valid rows would be overwritten)."""
    return jax.lax.dynamic_update_slice_in_dim(
        buf, rows.astype(buf.dtype), start, 0)


@jax.jit
def _pool_gather(buf, idx):
    return buf[jnp.clip(idx, 0, buf.shape[0] - 1)]


@jax.jit
def _shift_rows(state, damping_maps, src):
    """Gather every per-keyframe array of the video state (and the
    graph's damping maps) by `src` in one program — the rm_keyframe
    ring-buffer shift."""
    shifted = jax.tree_util.tree_map(lambda a: a[src], state)
    return shifted, damping_maps[src]


@partial(jax.jit, static_argnames=("eb", "h", "w", "buffer"))
def _alloc_pools(eb: int, h: int, w: int, buffer: int):
    """All six FactorGraph device pools in one program."""
    return (jnp.zeros((eb, h, w, 128), _NET_DTYPE),
            jnp.zeros((eb, h, w, 2), jnp.float32),
            jnp.zeros((eb, h, w, 2), jnp.float32),
            jnp.zeros((eb, h, w, 2), jnp.float32),
            jnp.zeros((eb, h, w, 2), jnp.float32),
            1e-6 * jnp.ones((buffer, h, w), jnp.float32))


@partial(jax.jit, static_argnums=1)
def _pool_write_zeros(buf, n_rows: int, start):
    """Zero n_rows of buf at (traced) offset start — fused variant of
    _pool_write(buf, zeros_like(rows), start) without the eager
    zeros_like broadcast."""
    z = jnp.zeros((n_rows,) + buf.shape[1:], buf.dtype)
    return jax.lax.dynamic_update_slice_in_dim(buf, z, start, 0)


@jax.jit
def _pool_conf(weight, h_axis=(1, 2, 3)):
    """Per-edge mean confidence (small D2H)."""
    return weight.mean(axis=h_axis)


@partial(jax.jit, static_argnames=("num_kf", "num_levels"))
def _update_kernel(params, poses, disps, intrinsics, fmaps, inps,
                   net, target, ii, jj, edge_valid, ix, num_kf: int,
                   num_levels: int = 4):
    """Fused DROID update operator over a padded edge set.

    params: DroidNet params; poses (B,7); disps (B,h,w); intrinsics (4,);
    fmaps (B,h,w,128) bf16; inps (B,h,w,128); net (N,h,w,128);
    target (N,h,w,2); ii/jj (N,); edge_valid (N,) bool; ix (N,) slot of
    ii within the padded unique-keyframe list.

    Returns (net', target', weight, eta, upmask, coords1, mask).
    """
    from ..models.droid_net import compute_dtype
    model = DroidNet(dtype=compute_dtype())
    h, w = disps.shape[-2:]
    coords0 = pops.coords_grid(h, w)

    intr_t = jnp.broadcast_to(intrinsics, (poses.shape[0], 4))
    coords1, mask = pops.projective_transform(
        poses[None], disps[None], intr_t[None], ii, jj)
    coords1 = coords1[0]
    mask = mask[0]

    motn = jnp.concatenate(
        [coords1 - coords0[None], target - coords1], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    # bf16 feature pyramid: half the HBM traffic on the gather-heavy
    # alt-corr path, fp32 accumulation inside the contraction
    fmap_pyr = corr_ops.build_fmap_pyramid(fmaps, num_levels)

    N = ii.shape[0]
    chunk = min(_CORR_CHUNK, N)
    n_chunks = N // chunk  # N is bucket-padded to a multiple of chunk

    def chunk_fn(args):
        ii_c, jj_c, net_c, motn_c, coords_c = args
        corr = corr_ops.alt_corr(fmap_pyr, ii_c, jj_c, coords_c)
        inp_c = inps[ii_c]
        net_n, delta, weight = model.apply(
            {"params": params}, net_c, inp_c, corr, motn_c,
            method=DroidNet.update_step)
        return net_n, delta, weight

    rs = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])
    net_n, delta, weight = jax.lax.map(
        chunk_fn, (rs(ii), rs(jj), rs(net), rs(motn), rs(coords1)))
    merge = lambda x: x.reshape((N,) + x.shape[2:])
    net_n, delta, weight = merge(net_n), merge(delta), merge(weight)

    eta, upmask = model.apply({"params": params}, net_n, ix, num_kf + 1,
                              method=DroidNet.update_agg)
    eta = eta[:num_kf]
    upmask = upmask[:num_kf]

    ev = edge_valid[:, None, None, None]
    target_new = jnp.where(ev, coords1 + delta.astype(jnp.float32), target)
    weight_new = jnp.where(ev, weight.astype(jnp.float32), 0.0)
    net_n = jnp.where(ev, net_n, net)
    return net_n, target_new, weight_new, eta, upmask, coords1, mask


# static cap on fused rounds per dispatch: stage2_flags is padded to
# this length; the fori_loop's TRACED bound n_rounds stops early. One
# compiled program therefore serves EVERY round count/stage schedule —
# the previous static (rounds, opt_types) specialization compiled a
# fresh ~30-60 s remote XLA variant per schedule per shape bucket.
MAX_ROUNDS = 16


@partial(jax.jit, static_argnames=("num_kf", "use_net", "mv_visible_num",
                                   "use_mono_thres", "do_upsample"))
def _fused_rounds(params, poses, disps, disps_up, intrinsics, fmaps, inps,
                  mono_disps, depth_scale, depth_shift, valid_small,
                  gt_poses, gt_disps, net, target_act, weight_act,
                  target_in, weight_in, ii_act, jj_act, edge_valid_act,
                  in_valid, ix, uniq_act, plan, damping_maps, mv_thresh,
                  EP, mono_thres, n_rounds, stage2_flags, cull_ij,
                  cull_beta, *, num_kf: int,
                  use_net: bool, mv_visible_num: int,
                  use_mono_thres: bool = False, do_upsample: bool = True):
    """N tracker update rounds — GRU + DSPO BA + upsample — in ONE program.

    The reference runs each round as many separate device launches
    (factor_graph.py:226-270, 8-16 rounds per keyframe); on a latency-bound
    dispatch path that is the throughput ceiling. The edge set is constant
    within a keyframe's rounds, so the whole loop fuses.

    net/target_act/weight_act are the DEVICE edge pools, padded to the
    pool bucket Na = len(ii_act); rows ≥ the true edge count are garbage
    and edge_valid_act masks them. target_in/weight_in are the selected
    inactive rows (own bucket, in_valid mask). The BA sees plan rows
    ordered [active pool | inactive block | padding] — all offsets static
    by shape, so no per-keyframe recompiles and (crucially) the pools
    never cross the host↔device link: the tunnel moves ~39 MB of GRU
    state per update otherwise.

    n_rounds: TRACED round count (≤ MAX_ROUNDS); stage2_flags: traced
    (MAX_ROUNDS,) bool — True selects a DSPO stage-2 (depth_scale) round,
    False a stage-1 (pose_depth) round. Both stage bodies live in one
    lax.cond so the round schedule is pure data: the program compiles
    ONCE per shape bucket, not once per schedule.
    Per-keyframe damping lives in damping_maps (buffer-indexed);
    plan.kx rows index straight into it.

    cull_ij (2,) int32 + cull_beta: the frontend's keyframe-cull check
    d(t1-2, t1-1) (frontend.py:85-86) computed on the POST-round poses
    inside this same program — the standalone distance kernel cost a
    separate dispatch chain + its own device→host sync per keyframe.
    Returned as the last output (bidirectional mean); callers that don't
    cull pass (0, 0) and ignore it (two h×w reprojections ≈ free next
    to one GRU round).
    """
    from ..ops.upsample import upsample_disp, upsample_disp_uniform
    from ..ops import lie
    from ..ops.ba import (_dba_iteration, _scale_shift_iteration,
                          align_scale_and_shift, bad_mono_frames)
    from .depth_video import depth_filter_kernel

    h, w = disps.shape[-2:]
    Na = ii_act.shape[0]
    Ni = target_in.shape[0]
    Np = plan.ii.shape[0]
    ev_act = edge_valid_act[:, None, None, None]
    weight_act = weight_act * ev_act
    weight_in = weight_in * in_valid[:, None, None, None]
    tail_t = jnp.zeros((Np - Na - Ni, h, w, 2))

    # upmask rides the loop carry so the post-loop upsample sees the LAST
    # round's mask.

    def round_body(r, carry):
        (poses, disps, net_out, target_act, weight_act, damping_maps,
         depth_scale, depth_shift, valid_small, upmask_c) = carry

        # --- update operator on the active edges -------------------------
        if use_net:
            net_out, t_new, w_new, eta_net, upmask, _, _ = _update_kernel(
                params, poses, disps, intrinsics, fmaps, inps, net_out,
                target_act, ii_act, jj_act, edge_valid_act, ix, num_kf)
            target_act = t_new
            weight_act = w_new
            # f32 carry: the agg head runs in the bf16 compute dtype and
            # fori_loop requires a dtype-stable carry
            upmask_c = upmask.astype(jnp.float32)
            # uniq_act is padded with an out-of-bounds sentinel -> dropped
            damping_maps = damping_maps.at[uniq_act].set(
                eta_net[:uniq_act.shape[0]], mode="drop")
        else:
            coords_gt, valid_gt = reproject_kernel(
                gt_poses, gt_disps, intrinsics, ii_act, jj_act)
            has_depth = (gt_disps[ii_act] > 1e-8)[..., None]
            target_act = coords_gt
            weight_act = jnp.broadcast_to(valid_gt * has_depth * ev_act,
                                          coords_gt.shape)

        target_all = jnp.concatenate([target_act, target_in, tail_t], 0)
        weight_all = jnp.concatenate([weight_act, weight_in, tail_t], 0)
        eta = 0.2 * damping_maps[plan.kx] + EP

        def run_stage1(poses, disps):
            for _ in range(2):
                dx, dz = _dba_iteration(
                    poses, disps, intrinsics, target_all, weight_all, eta,
                    jnp.zeros_like(disps), plan, 1e-4, 0.1, False)
                pose_idx = plan.t0 + jnp.arange(plan.P)
                new_p = lie.retr(poses[pose_idx], dx.astype(poses.dtype))
                poses = poses.at[pose_idx].set(lie.normalize(new_p))
                # Padded kx rows repeat kx[-1]; duplicate-index .set
                # clobbers that frame's update with unspecified order
                # (same hazard dba() fixed) — scatter-ADD masked
                # increments and clip only touched frames.
                dz_img = (dz.reshape(plan.M, h, w)
                          * plan.kx_valid[:, None, None])
                delta = jnp.zeros_like(disps).at[plan.kx].add(
                    dz_img.astype(disps.dtype))
                touched = jnp.zeros((disps.shape[0],), disps.dtype).at[
                    plan.kx].add(plan.kx_valid.astype(disps.dtype)) > 0
                upd = jnp.clip(disps + delta, 1e-5, None)
                disps = jnp.where(touched[:, None, None], upd, disps)
            return poses, disps

        def stage1_branch(poses, disps, depth_scale, depth_shift,
                          valid_small):
            poses, disps = run_stage1(poses, disps)
            return poses, disps, depth_scale, depth_shift, valid_small

        def stage2_branch(poses, disps, depth_scale, depth_shift,
                          valid_small):
            # stage-2: refresh the multiview mask + (w, q) init for the
            # touched frames (depth_video.py:236-251 semantics)
            kx = plan.kx
            d_kx = disps[kx]
            depths = 1.0 / jnp.clip(d_kx, 1e-8)
            thr = mv_thresh * depths.mean(axis=(1, 2))
            count = depth_filter_kernel(poses, disps, intrinsics,
                                        kx.astype(jnp.int32), thr)
            mv = count >= mv_visible_num
            dep_mv = jnp.where(mv, depths, jnp.nan)
            med = jnp.nanmedian(dep_mv.reshape(kx.shape[0], -1), axis=1)
            masks = mv & (depths < 3 * med[:, None, None])
            valid_small = valid_small.at[kx].set(masks)

            sc, sh, _ = align_scale_and_shift(mono_disps[kx], d_kx,
                                              valid_small[kx])
            depth_scale = depth_scale.at[kx].set(sc)
            depth_shift = depth_shift.at[kx].set(sh)

            if use_mono_thres:
                # bad-mono edge filtering ON DEVICE: the reference drops
                # edges whose endpoints have a badly-fitting mono prior
                # (depth_video.py:256-276, host-side there). Expressed as
                # a per-edge weight mask + per-frame update mask — zero
                # weight ≡ dropped edge in the normal equations, and
                # frames left with no kept edge are frozen exactly like
                # the reference's rebuilt edge plan. If EVERY edge drops,
                # fall back to a stage-1 round (dspo() returning False →
                # ba() retries "pose_depth").
                bad = bad_mono_frames(mono_disps, disps, valid_small,
                                      mono_thres)
                keep_e = ((~bad[plan.ii]) & (~bad[plan.jj])
                          & plan.edge_valid)
                # the reference rebuilds the plan from kept edges; its kx
                # still contains ALL of arange(t0,t1) (prior-only updates
                # for frames whose edges dropped) — only out-of-range
                # source frames (kx < t0) disappear with their edges
                kept_per_k = jax.ops.segment_sum(
                    keep_e.astype(jnp.float32),
                    jnp.where(keep_e, plan.kk, plan.M),
                    num_segments=plan.M + 1)[:-1] > 0
                kx_mask = kept_per_k | (plan.kx >= plan.t0)
                w2 = weight_all * keep_e[:, None, None, None]

                def stage2(poses, disps, dsc, dsh):
                    for _ in range(2):
                        disps, dsc, dsh = _scale_shift_iteration(
                            poses, disps, intrinsics, target_all, w2, eta,
                            mono_disps, dsc, dsh, valid_small, plan,
                            1e-4, 0.1, 0.01, kx_mask=kx_mask)
                    return poses, disps, dsc, dsh

                def stage1_fb(poses, disps, dsc, dsh):
                    poses, disps = run_stage1(poses, disps)
                    return poses, disps, dsc, dsh

                (poses, disps, depth_scale, depth_shift) = jax.lax.cond(
                    keep_e.any(), stage2, stage1_fb,
                    poses, disps, depth_scale, depth_shift)
            else:
                for _ in range(2):
                    disps, depth_scale, depth_shift = \
                        _scale_shift_iteration(
                            poses, disps, intrinsics, target_all,
                            weight_all, eta, mono_disps, depth_scale,
                            depth_shift, valid_small, plan,
                            1e-4, 0.1, 0.01)
            return poses, disps, depth_scale, depth_shift, valid_small

        (poses, disps, depth_scale, depth_shift, valid_small) = \
            jax.lax.cond(stage2_flags[r], stage2_branch, stage1_branch,
                         poses, disps, depth_scale, depth_shift,
                         valid_small)

        return (poses, disps, net_out, target_act, weight_act,
                damping_maps, depth_scale, depth_shift, valid_small,
                upmask_c)

    if use_net:
        # abstract-eval one agg call for the upmask carry shape (cheap:
        # shape inference only, no device work)
        up0 = jnp.zeros((num_kf, h, w, 8 * 8 * 9), jnp.float32)
    else:
        up0 = jnp.zeros((1,), jnp.float32)

    carry = (poses, disps, net, target_act, weight_act, damping_maps,
             depth_scale, depth_shift, valid_small, up0)
    carry = jax.lax.fori_loop(
        0, jnp.minimum(n_rounds, MAX_ROUNDS), round_body, carry)
    (poses, disps, net_out, target_act, weight_act, damping_maps,
     depth_scale, depth_shift, valid_small, upmask_f) = carry

    # --- convex upsampling of the touched disparities ---------------------
    # ONCE after the rounds, not per round: disps_up is only consumed
    # outside tracking (mapper / eval), so intermediate-round upsamples
    # are dead writes (last write wins).
    if do_upsample:
        uniq_safe = jnp.clip(uniq_act, 0, disps.shape[0] - 1)
        if use_net:
            up = upsample_disp(disps[uniq_safe],
                               upmask_f[:uniq_act.shape[0]])
        else:
            up = upsample_disp_uniform(disps[uniq_safe])
        disps_up = disps_up.at[uniq_act].set(up, mode="drop")

    # keyframe-cull distance on the post-round poses (see docstring)
    from .depth_video import frame_distance_kernel
    ci = cull_ij[:1]
    cj = cull_ij[1:]
    cull_d = 0.5 * (
        frame_distance_kernel(poses, disps, intrinsics, ci, cj, cull_beta)
        + frame_distance_kernel(poses, disps, intrinsics, cj, ci,
                                cull_beta))[0]

    return (poses, disps, disps_up, net_out, target_act, weight_act,
            damping_maps, depth_scale, depth_shift, valid_small, cull_d)


@partial(jax.jit, static_argnames=("num_kf",))
def _fused_motion_rounds(params, poses, disps, intrinsics, fmaps, inps,
                         net, target, ii, jj, edge_valid, ix, plan,
                         rounds, *, num_kf: int):
    """`rounds` motion-only tracker rounds — GRU update + MoBA — in ONE
    device program.

    The TrajectoryFiller hot path: the reference runs 12 separate
    update(motion_only=True) dispatch chains per 16-frame batch
    (thirdparty/glorie_slam/trajectory_filler.py:85-90), each paying an
    update-kernel launch, host target/weight pulls, and a BA dispatch.
    Here the whole refinement is one program; only the final pose read
    leaves the device."""
    from ..ops.ba import dba
    h, w = disps.shape[-2:]
    eta0 = jnp.zeros((plan.M, h, w))        # unused by motion-only solves
    sens0 = jnp.zeros_like(disps)

    def body(_, carry):
        poses, net, target = carry
        net, target, weight, _, _, _, _ = _update_kernel(
            params, poses, disps, intrinsics, fmaps, inps, net, target,
            ii, jj, edge_valid, ix, num_kf)
        poses, _ = dba(poses, disps, intrinsics, target, weight, eta0,
                       sens0, plan, iters=2, motion_only=True)
        return poses, net, target

    return jax.lax.fori_loop(0, rounds, body, (poses, net, target))


class FactorGraph:
    """Mirrors the reference FactorGraph API on top of the fused kernel."""

    def __init__(self, video, params, max_factors=-1, upsample=True,
                 oracle=False):
        self.video = video
        self.params = params
        self.max_factors = max_factors
        self.upsample_flag = upsample
        # oracle mode: flow targets come from GT geometry instead of the
        # learned update operator — used when no pretrained droid.pth is
        # available (none ships in this environment) to exercise and
        # benchmark the full BA/fusion/mapping stack end-to-end.
        self.oracle = oracle

        self.h = video.H // video.down
        self.w = video.W // video.down

        # Edge bookkeeping (ii/jj/age) is host numpy — it drives control
        # flow. The per-edge TENSORS (GRU state, targets, weights) live in
        # DEVICE pools padded to a geometric bucket, mutated only by small
        # fixed-shape jitted ops (_pool_*): moving them through the host
        # (39 MB of GRU state per update over the axon tunnel's
        # ~10-50 MB/s link) cost ~10 s per keyframe, and eager per-length
        # device ops cost one compiler RPC per new length. Rows at
        # index ≥ len(self.ii) are garbage; every consumer masks them.
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        eb = _EDGE_BUCKET
        # ONE allocation program for all six pools (a new graph is built
        # per backend/loop/filler call — six eager zeros each added up)
        (self.net, self.target, self.weight, self.target_inac,
         self.weight_inac, self.damping_maps) = _alloc_pools(
            eb, self.h, self.w, video.buffer)

        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

    # -- edge mutation (factor_graph.py:111-223) ----------------------------

    def __filter_repeated_edges(self, ii, jj):
        eset = set(zip(self.ii.tolist(), self.jj.tolist())) | set(
            zip(self.ii_inac.tolist(), self.jj_inac.tolist()))
        keep = np.asarray([(i, j) not in eset for i, j in zip(ii, jj)], bool)
        return ii[keep], jj[keep]

    def add_factors(self, ii, jj, remove=False):
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self.__filter_repeated_edges(ii, jj)
        if ii.shape[0] == 0:
            return

        if (self.max_factors > 0
                and self.ii.shape[0] + ii.shape[0] > self.max_factors
                and self.ii.shape[0] > 0 and remove):
            ix = np.argsort(self.age)
            keep_rank = np.empty_like(ix)
            keep_rank[ix] = np.arange(len(ix))
            drop = keep_rank >= (self.max_factors - ii.shape[0])
            self.rm_factors(drop, store=True)

        k = len(ii)
        n_old = len(self.ii)
        kpad_ii, _ = _pad_idx_fg(ii, base=8)
        kpad_jj, _ = _pad_idx_fg(jj, base=8)
        KPAD = len(kpad_ii)
        # grow pools so the padded write block fits past the valid rows
        need = _geom_bucket(max(n_old + KPAD, 1), _EDGE_BUCKET)
        if need > self.net.shape[0]:
            self.net = _pool_resize(self.net, need)
            self.target = _pool_resize(self.target, need)
            self.weight = _pool_resize(self.weight, need)

        s = self.video.state
        # all index prep on HOST (int64→int32 / clip on device are eager
        # one-op programs: a dispatch each over the tunnel)
        ii_j = jnp.asarray(np.asarray(kpad_ii, np.int32))
        jj_j = jnp.asarray(np.asarray(kpad_jj, np.int32))
        nets_new = _pool_gather(s.nets, ii_j)   # jitted gather (clips)
        tgt_new, _ = reproject_kernel(s.poses, s.disps, self.video.intr0,
                                      ii_j, jj_j)
        start = jnp.asarray(np.asarray(n_old, np.int32))
        self.net = _pool_write(self.net, nets_new, start)
        self.target = _pool_write(self.target, tgt_new, start)
        self.weight = _pool_write_zeros(self.weight,
                                        int(tgt_new.shape[0]), start)

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros_like(ii)])

    def rm_factors(self, mask, store=False):
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        if store:
            ridx = np.where(mask)[0]
            ridx_pad, r = _pad_idx_fg(ridx, base=8, fill=0)
            rows_t = _pool_gather(self.target, jnp.asarray(ridx_pad))
            rows_w = _pool_gather(self.weight, jnp.asarray(ridx_pad))
            ni_old = len(self.ii_inac)
            need = _geom_bucket(max(ni_old + len(ridx_pad), 1),
                                _EDGE_BUCKET)
            if need > self.target_inac.shape[0]:
                self.target_inac = _pool_resize(self.target_inac, need)
                self.weight_inac = _pool_resize(self.weight_inac, need)
            st_i = jnp.asarray(ni_old)
            self.target_inac = _pool_write(self.target_inac, rows_t, st_i)
            self.weight_inac = _pool_write(self.weight_inac, rows_w, st_i)
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])

        keep = np.where(~mask)[0]
        perm = np.zeros(self.net.shape[0], np.int32)
        perm[:len(keep)] = keep
        perm_j = jnp.asarray(perm)
        self.net = _pool_gather(self.net, perm_j)
        self.target = _pool_gather(self.target, perm_j)
        self.weight = _pool_gather(self.weight, perm_j)
        self.ii = self.ii[~mask]
        self.jj = self.jj[~mask]
        self.age = self.age[~mask]

    def filter_edges(self):
        """Remove edges with low confidence (factor_graph.py:83-90)."""
        conf = np.asarray(_pool_conf(self.weight))[:len(self.ii)]
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.__init__(self.video, self.params, self.max_factors,
                      self.upsample_flag)

    def rm_keyframe(self, ix):
        """Drop keyframe ix: shift the video ring buffer down and fix up
        edge indices (factor_graph.py:187-223)."""
        s = self.video.state
        B = self.video.buffer
        src = np.arange(B)
        src[ix:-1] = src[ix:-1] + 1
        src = jnp.asarray(np.clip(src, 0, B - 1).astype(np.int32))
        # ONE program for the whole ring-buffer shift (was 18 eager
        # full-buffer gathers per culled keyframe)
        self.video.state, self.damping_maps = _shift_rows(
            s, self.damping_maps, src)
        self.video.pose_gen += 1
        if ix == 0:
            self.video._intr0 = None    # row 0 rewritten by the shift
        d = self.video.dirty
        d[ix:-1] = d[ix + 1:]
        d2 = self.video.npc_dirty
        d2[ix:-1] = d2[ix + 1:]

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1,
                                self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1,
                                self.jj_inac)
        if m.any():
            keep = np.where(~m)[0]
            perm = np.zeros(self.target_inac.shape[0], np.int32)
            perm[:len(keep)] = keep
            perm_j = jnp.asarray(perm)
            self.target_inac = _pool_gather(self.target_inac, perm_j)
            self.weight_inac = _pool_gather(self.weight_inac, perm_j)
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    # -- the update operator (factor_graph.py:226-270) -----------------------

    def _padded_edges(self):
        """(ii, jj) padded to the DEVICE POOL bucket + unique-keyframe
        slots. The pool bucket is the single source of truth for the
        active-edge shape so pool tensors feed the kernels directly."""
        n = self.ii.shape[0]
        Np = self.net.shape[0]
        ii_p = np.zeros(Np, np.int64)
        jj_p = np.zeros(Np, np.int64)
        ii_p[:n] = self.ii
        jj_p[:n] = self.jj
        valid = np.arange(Np) < n
        uniq, inv = np.unique(self.ii, return_inverse=True)
        Mk = _geom_bucket(max(len(uniq), 1), _KF_BUCKET)
        ix = np.concatenate([inv, np.full(Np - n, Mk, np.int64)])
        return ii_p, jj_p, valid, ix, uniq, Mk

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               EP=1e-7, motion_only=False, opt_type="pose_depth"):
        if self.ii.shape[0] == 0:
            return
        if self.oracle:
            return self._update_oracle(t0, t1, itrs, use_inactive, EP,
                                       motion_only, opt_type)
        ii_p, jj_p, valid, ix, uniq, Mk = self._padded_edges()
        n = self.ii.shape[0]

        s = self.video.state
        net_n, target, weight, eta, upmask, coords1, _ = _update_kernel(
            self.params, s.poses, s.disps, self.video.intr0, s.fmaps, s.inps,
            self.net, self.target,
            jnp.asarray(ii_p, jnp.int32), jnp.asarray(jj_p, jnp.int32),
            jnp.asarray(valid), jnp.asarray(ix, jnp.int32), Mk)

        self.net = net_n
        self.target = target
        self.weight = weight

        # per-keyframe damping (factor_graph.py:250)
        uniq_j = jnp.asarray(uniq)
        self.damping_maps = self.damping_maps.at[uniq_j].set(
            eta[:len(uniq)])

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)

        # host copies for the (rare) host-driven BA dispatch below
        # (mono_thres edge filtering is host-side; this path is not the
        # hot loop — the fused update_rounds is)
        target_h = np.asarray(target)[:n]
        weight_h = np.asarray(weight)[:n]
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii = np.concatenate([self.ii_inac[m], self.ii])
            jj = np.concatenate([self.jj_inac[m], self.jj])
            sel = np.where(m)[0]
            t_in = np.asarray(_pool_gather(
                self.target_inac,
                jnp.asarray(np.concatenate([sel, [0]]), jnp.int32)))[:-1] \
                if len(sel) else np.zeros((0, self.h, self.w, 2), np.float32)
            w_in = np.asarray(_pool_gather(
                self.weight_inac,
                jnp.asarray(np.concatenate([sel, [0]]), jnp.int32)))[:-1] \
                if len(sel) else np.zeros((0, self.h, self.w, 2), np.float32)
            target_all = np.concatenate([t_in, target_h], 0)
            weight_all = np.concatenate([w_in, weight_h], 0)
        else:
            ii, jj = self.ii, self.jj
            target_all, weight_all = target_h, weight_h

        uniq_all = np.unique(ii)
        damping = 0.2 * self.damping_maps[jnp.asarray(uniq_all)] + EP

        self.video.ba(target_all, weight_all, damping, ii, jj, t0, t1,
                      iters=itrs, lm=1e-4, ep=0.1, motion_only=motion_only,
                      opt_type=opt_type)

        if self.upsample_flag:
            self.video.upsample(uniq, upmask[:len(uniq)])
        self.age += 1

    def _update_oracle(self, t0, t1, itrs, use_inactive, EP, motion_only,
                       opt_type):
        """GT-flow update: targets from ground-truth geometry, unit
        weights. Same BA dispatch as the learned path."""
        s = self.video.state
        n_e = len(self.ii)
        ii_p, jj_p, valid, _, _, _ = self._padded_edges()
        ii_j = jnp.asarray(ii_p, jnp.int32)
        coords_gt, valid_gt = reproject_kernel(
            s.gt_poses, s.gt_disps, self.video.intr0,
            ii_j, jnp.asarray(jj_p, jnp.int32))
        # mask pixels with no GT depth (hole pixels have gt_disp == 0 and
        # would otherwise inject infinite-depth targets at full weight)
        has_depth = (s.gt_disps[ii_j] > 1e-8)[..., None]
        ev = jnp.asarray(valid)[:, None, None, None]
        weight_d = jnp.broadcast_to(valid_gt * has_depth * ev,
                                    coords_gt.shape)
        self.target = coords_gt
        self.weight = weight_d

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        target_h = np.asarray(coords_gt)[:n_e]
        weight_h = np.asarray(weight_d)[:n_e]
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii = np.concatenate([self.ii_inac[m], self.ii])
            jj = np.concatenate([self.jj_inac[m], self.jj])
            sel = np.where(m)[0]
            if len(sel):
                sel_j = jnp.asarray(np.concatenate([sel, [0]]), jnp.int32)
                t_in = np.asarray(_pool_gather(self.target_inac, sel_j))[:-1]
                w_in = np.asarray(_pool_gather(self.weight_inac, sel_j))[:-1]
            else:
                t_in = np.zeros((0, self.h, self.w, 2), np.float32)
                w_in = np.zeros((0, self.h, self.w, 2), np.float32)
            target = np.concatenate([t_in, target_h], 0)
            weight = np.concatenate([w_in, weight_h], 0)
        else:
            ii, jj = self.ii, self.jj
            target, weight = target_h, weight_h
        uniq_all = np.unique(ii)
        damping = jnp.full((len(uniq_all), self.h, self.w), 1e-4)
        self.video.ba(target, weight, damping, ii, jj, t0, t1,
                      iters=itrs, lm=1e-4, ep=0.1, motion_only=motion_only,
                      opt_type=opt_type)
        if self.upsample_flag:
            uniq = np.unique(self.ii)
            self.video.upsample(uniq, None)
        self.age += 1

    def update_rounds(self, opt_types, t0=None, t1=None, use_inactive=False,
                      EP=1e-7, upsample=True, cull_pair=None,
                      cull_beta=0.3):
        """Run len(opt_types) update rounds in ONE device dispatch.

        mono_thres bad-mono edge filtering runs ON DEVICE inside
        _fused_rounds (per-edge weight mask), so every configuration —
        including ScanNet/TUM defaults with mono_thres set — takes the
        fused path.

        cull_pair=(i, j): also compute the frontend's keyframe-cull
        distance d(i, j) (bidirectional) on the post-round state inside
        the same program; returned as a DEVICE scalar (the caller pulls
        it — one sync instead of a second dispatch chain + sync)."""
        if len(self.ii) == 0:
            return None
        if self.video.BA_type != "DSPO":
            opt_types = tuple("pose_depth" for _ in opt_types)

        # the fused program takes a TRACED round count + stage schedule
        # (one compile per shape bucket, any schedule); only schedules
        # beyond MAX_ROUNDS need chunked dispatches
        if len(opt_types) > MAX_ROUNDS:
            d = None
            for c0 in range(0, len(opt_types), MAX_ROUNDS):
                chunk = opt_types[c0:c0 + MAX_ROUNDS]
                last = c0 + MAX_ROUNDS >= len(opt_types)
                d = self.update_rounds(chunk, t0=t0, t1=t1,
                                       use_inactive=use_inactive, EP=EP,
                                       upsample=upsample and last,
                                       cull_pair=cull_pair if last else None,
                                       cull_beta=cull_beta)
            return d

        ii_p, jj_p, valid, ix, uniq, Mk = self._padded_edges()
        # pad uniq to the keyframe bucket with an OOB sentinel (dropped in
        # scatters) so unique-count changes don't retrigger compilation
        uniq_pad = np.full(Mk, self.video.buffer, np.int64)
        uniq_pad[:len(uniq)] = uniq
        Na = len(ii_p)
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            sel = np.where(m)[0]
            ii_in = self.ii_inac[m]
            jj_in = self.jj_inac[m]
        else:
            sel = np.zeros(0, np.int64)
            ii_in = np.zeros(0, np.int64)
            jj_in = np.zeros(0, np.int64)
        n_inac = len(sel)
        # inactive rows gathered on DEVICE into their own bucket
        NiPAD = _geom_bucket(max(n_inac, 1), 16)
        sel_pad = np.zeros(NiPAD, np.int32)
        sel_pad[:n_inac] = sel
        sel_j = jnp.asarray(sel_pad)
        t_in = _pool_gather(self.target_inac, sel_j)
        w_in = _pool_gather(self.weight_inac, sel_j)
        in_valid = np.arange(NiPAD) < n_inac
        ii_in_p = np.zeros(NiPAD, np.int64)
        jj_in_p = np.zeros(NiPAD, np.int64)
        ii_in_p[:n_inac] = ii_in
        jj_in_p[:n_inac] = jj_in
        # plan layout: [active pool (Na) | inactive block (NiPAD) | pad];
        # every offset is static by shape → no per-keyframe recompiles
        ii_all = np.concatenate([ii_p, ii_in_p])
        jj_all = np.concatenate([jj_p, jj_in_p])
        valid_all = np.concatenate([valid, in_valid])
        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max(),
                         ii_in.max() if n_inac else 0,
                         jj_in.max() if n_inac else 0)) + 1
        from ..ops import ba as ba_ops
        # Shape buckets: without them the (Np, M, P, D) tuple shifts as
        # the graph grows and almost every mapped keyframe compiled a
        # fresh ~30 s XLA variant (measured on the TPU tunnel). GEOMETRIC
        # buckets (base·2^k) bound the variants at log2(buffer/16) ≈ 3
        # while keeping the depth/pose system sized to the live frame
        # count — the earlier flat buffer-sized floor made every smoke
        # DBA a 64-frame solve when ~12 frames were active (the dominant
        # fused-rounds cost, measured ~4x the 16-frame solve).
        plan = ba_ops.make_edge_plan(ii_all, jj_all, int(t0), int(t1),
                                     valid=valid_all,
                                     edge_bucket=64, depth_bucket=16,
                                     group_bucket=16, pose_bucket=16)

        s = self.video.state
        mv_cfg = self.video.cfg["tracking"]["multiview_filter"]

        cull_ij = np.asarray(cull_pair if cull_pair is not None else (0, 0),
                             np.int32)
        (poses, disps, disps_up, net_out, target_act, weight_act,
         damping_maps, depth_scale, depth_shift, valid_small, cull_d) = \
            _fused_rounds(
                self.params, s.poses, s.disps, s.disps_up, self.video.intr0,
                s.fmaps, s.inps, s.mono_disps, s.depth_scale,
                s.depth_shift, s.valid_depth_mask_small, s.gt_poses,
                s.gt_disps, self.net, self.target, self.weight, t_in, w_in,
                # dtype-cast in NUMPY: jnp.asarray(int64, int32) runs an
                # eager convert_element_type program on device per call
                jnp.asarray(np.asarray(ii_p, np.int32)),
                jnp.asarray(np.asarray(jj_p, np.int32)),
                jnp.asarray(np.asarray(valid, bool)),
                jnp.asarray(np.asarray(in_valid, bool)),
                jnp.asarray(np.asarray(ix, np.int32)),
                jnp.asarray(np.asarray(uniq_pad, np.int32)),
                plan, self.damping_maps,
                mv_cfg["thresh"], EP,
                float(self.video.mono_thres or 0.0),
                jnp.asarray(len(opt_types), jnp.int32),
                jnp.asarray(np.asarray(
                    [t == "depth_scale" for t in opt_types]
                    + [False] * (MAX_ROUNDS - len(opt_types)), bool)),
                jnp.asarray(cull_ij), jnp.asarray(cull_beta, jnp.float32),
                num_kf=Mk, use_net=not self.oracle,
                mv_visible_num=mv_cfg["visible_num"],
                use_mono_thres=bool(self.video.mono_thres),
                do_upsample=upsample and self.upsample_flag)

        s.poses = poses
        s.disps = disps
        s.disps_up = disps_up
        s.depth_scale = depth_scale
        s.depth_shift = depth_shift
        s.valid_depth_mask_small = valid_small
        self.video.pose_gen += 1
        self.damping_maps = damping_maps
        # pool-shaped device outputs: no host round trip
        self.net = net_out
        self.target = target_act
        self.weight = weight_act
        self.age += len(opt_types)

        # achieved-FLOPs model (host arithmetic only). Per edge-pixel per
        # round: learned path ≈ alt-corr (4 lvl × 49 taps × 128-d dot × 2)
        # + ConvGRU/heads (~3 conv3x3 with ~384→128 ch ≈ 2.7 MF) ≈ 2.8 MF;
        # oracle reprojection ≈ 2 kF. DBA: ~1.5 kF per edge-pixel per GN
        # iteration (Jacobian products + 6×6 block accumulate), 2 iters
        # per round, plus the dense pose solve (negligible at P ≤ 64).
        px = self.h * self.w
        n_edges = Na + n_inac
        per_round = (2.8e6 if not self.oracle else 2e3) * n_edges * px \
            + 2 * 1.5e3 * plan.ii.shape[0] * px
        self.video.flops_tracking += per_round * len(opt_types)
        return cull_d if cull_pair is not None else None

    def update_rounds_motion_only(self, rounds, t0, t1):
        """`rounds` motion-only update rounds (GRU + MoBA) in ONE device
        dispatch — poses in [t0, t1) move, everything else is frozen.
        Used by the TrajectoryFiller (trajectory_filler.py:85-90)."""
        if len(self.ii) == 0:
            return
        from ..ops import ba as ba_ops
        ii_p, jj_p, valid, ix, uniq, Mk = self._padded_edges()
        # small pose bucket: the filler's window is ≤16 new frames, so the
        # pose system stays ≤ (16·6)² instead of the tracker's
        # buffer-floored bucket
        plan = ba_ops.make_edge_plan(ii_p, jj_p, int(t0), int(t1),
                                     valid=valid, edge_bucket=len(ii_p),
                                     pose_bucket=16)
        s = self.video.state
        poses, net, target = _fused_motion_rounds(
            self.params, s.poses, s.disps, self.video.intr0, s.fmaps,
            s.inps, self.net, self.target,
            jnp.asarray(ii_p, jnp.int32), jnp.asarray(jj_p, jnp.int32),
            jnp.asarray(valid), jnp.asarray(ix, jnp.int32), plan,
            jnp.asarray(rounds, jnp.int32), num_kf=Mk)
        s.poses = poses
        self.video.pose_gen += 1
        self.net = net
        self.target = target
        self.age += rounds

    def update_lowmem(self, t0=None, t1=None, itrs=2, use_inactive=False,
                      EP=1e-7, steps=8, enable_wq=True,
                      motion_only=False):
        """Global-BA update loop (factor_graph.py:273-323). The reference
        alternates sub-batched GRU sweeps with BA; here all `steps` rounds
        fuse into one device program (update_rounds). motion_only routes
        to the fused MoBA rounds (poses only — loop_ba's motion_only
        request used to be silently ignored)."""
        if motion_only:
            if t1 is None:
                t1 = self.video.counter
            self.update_rounds_motion_only(steps, t0 or 0, t1)
            return
        opt_types = tuple(
            "pose_depth" if (step % 2 == 0 or not enable_wq)
            else "depth_scale" for step in range(steps))
        self.update_rounds(opt_types, t0=t0, t1=t1,
                           use_inactive=use_inactive, EP=EP)

    # -- edge proposal (factor_graph.py:326-476) -----------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False, dist_override=None):
        t = self.video.counter
        ix_r = np.arange(t0, t)
        jx_r = np.arange(t1, t)
        if len(ix_r) == 0 or len(jx_r) == 0:
            return
        ii, jj = np.meshgrid(ix_r, jx_r, indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        # dist_override: the frontend's speculative prefetch of exactly
        # this pair grid's distances (frontend._dispatch_spec) — same
        # kernel, dispatched at the END of the previous keyframe's update
        # so the pull overlaps the inter-keyframe work
        if dist_override is not None and len(dist_override) == len(ii):
            d = np.asarray(dist_override, np.float32).copy()
        else:
            d = self.video.distance(ii, jj, beta=beta).copy()
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])

        def suppress(i, j):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if (t0 <= i1 < t) and (t1 <= j1 < t):
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        for i, j in zip(ii1, jj1):
            suppress(int(i), int(j))

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                d[(i - t0) * (t - t1) + (j - t1)] = np.inf

        for k in np.argsort(d):
            if d[k] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if es:
            es = np.asarray(es)
            self.add_factors(es[:, 0], es[:, 1], remove)

    def add_backend_proximity_factors(self, t_start, t_end, nms, radius,
                                      thresh, max_factors, beta,
                                      t_start_loop=None, loop=False):
        """Backend/loop-closure edge proposal (factor_graph.py:400-476)."""
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        ilen = t_end - t_start_loop
        jlen = t_end - t_start
        if ilen <= 0 or jlen <= 0:
            return 0
        ix_r = np.arange(t_start_loop, t_end)
        jx_r = np.arange(t_start, t_end)
        ii, jj = np.meshgrid(ix_r, jx_r, indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        d = self.video.distance(ii, jj, beta=beta).copy()
        rawd = d.copy().reshape(ilen, jlen)
        d[ii - radius < jj] = np.inf
        d[d > thresh] = np.inf
        d = d.reshape(ilen, jlen)

        es = []
        for i in range(t_start_loop, t_end):
            for j in range(max(i - radius - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                d[i - t_start_loop, j - t_start] = np.inf

        vals_ix = np.argsort(d.reshape(-1))
        loop_edges = 0
        n_neighboring = 1
        for k in vals_ix:
            di, dj = k // jlen, k % jlen
            if d[di, dj] > thresh:
                # CONTINUE, not break: the argsort is computed once, so a
                # candidate wiped to inf by a previous pick's NMS window
                # appears mid-sequence; breaking there would end selection
                # before any far-separation loop pair is reached
                # (reference factor_graph.py:441-443)
                continue
            if len(es) > max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            if loop:
                sub = []
                for si in range(max(i - n_neighboring, t_start_loop),
                                min(i + n_neighboring + 1, t_end)):
                    for sj in range(max(j - n_neighboring, t_start),
                                    min(j + n_neighboring + 1, t_end)):
                        if rawd[si - t_start_loop, sj - t_start] <= thresh \
                                and si != sj and si - sj > 20:
                            sub.append((si, sj))
                es += sub
                loop_edges += len(sub)
            else:
                es.append((i, j))
                es.append((j, i))
            d[max(0, di - nms):min(ilen, di + nms + 1),
              max(0, dj - nms):min(jlen, dj + nms + 1)] = np.inf

        if len(es) < 3 or (loop and loop_edges == 0):
            return 0
        es = np.asarray(es)
        self.add_factors(es[:, 0], es[:, 1], remove=True)
        return len(self.ii)
