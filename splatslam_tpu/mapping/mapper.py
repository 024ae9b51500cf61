"""Mapper: deformable 3D Gaussian Splatting over tracker keyframes.

Reference: src/mapper.py:43-1116. Same control flow — proxy-depth fusion,
covisibility keyframe window, map deformation after pose/depth updates,
windowed optimization with densify/prune, final refinement — restructured
so the hot loop is one jitted `map_step` (render all window cameras via a
checkpointed scan, one backward, fused Adam updates) instead of the
reference's per-camera rasterizer calls with host-side optimizer steps.

The reference's two-process pipe handshake becomes a plain method call:
the SLAM orchestrator calls `process_keyframe` after each tracker
keyframe (tracker.py:82-84 ↔ mapper.py:880-1116 semantics).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, rasterizer as rz, sh as sh_ops
from . import gaussians as G
from .camera import Camera, make_camera
from .losses import mapping_loss, get_median_depth


def _round_up(x, m):
    return max(((x + m - 1) // m) * m, m)


@jax.jit
def _stack_jit(xs):
    """Stack a tuple of same-shape device arrays in one program (eager
    jnp.stack issues ~8 broadcast/concat dispatches)."""
    return jnp.stack(xs)


@partial(jax.jit, static_argnames=("H", "W", "K", "sh_degree", "max_span"))
def _eval_render(st, w2cs, intrinsics, *, H, W, K, sh_degree, max_span):
    """Eval-path batched render as ONE program: activation transforms,
    SH colors, and rasterize_batch fused (eagerly ~10 dispatches per
    render call)."""
    if sh_degree > 0:
        campos = -jnp.einsum("bji,bj->bi", w2cs[:, :3, :3], w2cs[:, :3, 3])
        cols = jax.vmap(
            lambda cp: sh_ops.sh_colors(sh_degree, st.f_dc, st.f_rest,
                                        st.xyz, cp))(campos)
    else:
        cols = G.get_colors_dc(st)
    B = w2cs.shape[0]
    return rz.rasterize_batch(
        st.xyz, G.get_scaling(st), st.rotation, G.get_opacity(st)[:, 0],
        cols, st.alive, w2cs, jnp.zeros((B, 6)), intrinsics,
        jnp.zeros(3), H=H, W=W, K=K, max_span=max_span)


@partial(jax.jit, static_argnames=("H", "W", "K", "sh_degree", "max_span"))
def _fuse_and_gate(st, disps_up, valid_mask, poses, depth_scale,
                   depth_shift, mono, has_mono, idx, sel, intrinsics,
                   occ_vis, win_uids,
                   *, H, W, K, sh_degree, max_span):
    """process_keyframe's per-keyframe prologue as ONE program + ONE pull:
    proxy-depth fusion of the new keyframe (get_w2c_and_depth,
    mapper.py:258-301) fused with the keyframe-gate render AND the
    visibility-overlap counts the keyframe decisions need (median depth +
    inter/union vs the window's occ visibility, mapper.py:744-831 +
    939-989). Previously two programs with a device→host sync each plus
    a full (C,)-mask pull; the link RTT per sync is the dominant
    per-keyframe cost on the tunneled TPU.

    occ_vis: (buffer+2, C) bool device visibility table (row buffer is
    the all-False read pad; row buffer+1 is never written); win_uids
    (Wmax,) int32 current window uids padded with `buffer`.

    Returns (depth_scale', depth_shift', fused_depth (H,W), small f32) —
    small = [w2c 16f | invalid | median | cur_vis_sum |
             inter(Wmax) | occ_sum(Wmax)], ONE host fetch.
    """
    from . import fusion
    fused, w2c, sc, sh, invalid = fusion.fuse_proxy_depth(
        disps_up[idx][None], valid_mask[idx][None], poses[idx][None],
        mono[None], has_mono[None])
    depth_scale, depth_shift, _ = _refresh_writeback(
        depth_scale, depth_shift, sc, sh, sel[None], w2c, invalid)
    out = _eval_render(st, w2c, intrinsics, H=H, W=W, K=K,
                       sh_degree=sh_degree, max_span=max_span)
    med = get_median_depth(out.depth[0], out.alpha[0])
    cur = out.n_touched[0] > 0
    rows = occ_vis[win_uids]                             # (Wmax, C)
    inter = jnp.sum(rows & cur[None], axis=1).astype(jnp.float32)
    osum = jnp.sum(rows, axis=1).astype(jnp.float32)
    small = jnp.concatenate(
        [w2c.reshape(16), invalid.astype(jnp.float32),
         jnp.reshape(med, (1,)).astype(jnp.float32),
         jnp.reshape(jnp.sum(cur), (1,)).astype(jnp.float32),
         inter, osum])
    return depth_scale, depth_shift, fused[0], small


@jax.jit
def _occ_scatter(occ_vis, n_touched, uids):
    """Write per-camera visibility rows into the device table. Pad rows
    carry an OOB uid (buffer+2) and are dropped."""
    return occ_vis.at[uids].set(n_touched > 0, mode="drop")


@jax.jit
def _occ_scatter_and_prune(st, occ_vis, n_touched, uids, win_uids,
                           min_kf_id):
    """The prune pass's epilogue fused on device (mapper.py:502-557):
    scatter the fresh window visibility, reduce per-Gaussian observation
    counts over the window, and prune Gaussians observed <=3 times among
    the recent keyframes — no (B,C) mask pull, no n_obs upload."""
    occ_vis = _occ_scatter(occ_vis, n_touched, uids)
    n_obs = jnp.sum(occ_vis[win_uids].astype(jnp.int32), axis=0)
    to_prune = (n_obs <= 3) & (st.kf_id >= min_kf_id) & st.alive
    return G.prune_by_mask(st, to_prune), occ_vis


@jax.jit
def _pack_cam_outputs(expo, exp_m, exp_v, w2cs, n_touched, alive):
    """_run_iters' per-camera host pull as ONE program: [expo 2 | adam m
    2 | adam v 2 | w2c 16 | Σ n_touched | Σ alive] per row."""
    B = expo.shape[0]
    blend = jnp.broadcast_to(
        jnp.sum(n_touched).astype(jnp.float32)[None, None], (B, 1))
    al = jnp.broadcast_to(
        jnp.sum(alive).astype(jnp.float32)[None, None], (B, 1))
    return jnp.concatenate(
        [expo, exp_m, exp_v, w2cs.reshape(B, 16), blend, al], axis=1)


@jax.jit
def _grow_occ(occ_vis):
    """Double the Gaussian-capacity axis of the visibility table (keeps
    pace with G.grow_capacity)."""
    R, C = occ_vis.shape
    out = jnp.zeros((R, 2 * C), occ_vis.dtype)
    return out.at[:, :C].set(occ_vis)


@jax.jit
def _refresh_writeback(depth_scale, depth_shift, sc, sh, sel, w2c,
                       invalid):
    """refresh_keyframes epilogue as ONE program: masked scale/shift
    scatter into the tracker rows + the packed per-frame host pull
    [w2c 16 floats | invalid flag]. Rows that must not write (pad rows,
    no-mono rows) carry an OOB sel; rows whose fusion failed are gated
    to OOB here via `invalid`."""
    buf = depth_scale.shape[0]
    sel = jnp.where(invalid, buf, sel)      # failed fits don't write
    new_scale = depth_scale.at[sel].set(sc, mode="drop")
    new_shift = depth_shift.at[sel].set(sh, mode="drop")
    small = jnp.concatenate(
        [w2c.reshape(w2c.shape[0], 16),
         invalid[:, None].astype(jnp.float32)], 1)
    return new_scale, new_shift, small


# ---------------------------------------------------------------------------
# jitted optimization step
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("H", "W", "K", "use_ssim", "opt_poses",
                                   "sh_degree", "want_touched", "max_span"))
def map_step(st: G.GaussianState, exp_state, tau_state, w2cs, images,
             depths, exposure, use_exposure, cam_valid, opt_pose_mask,
             intrinsics, lrs, cam_lrs, step, iso_weight,
             tile_ids=None, tile_counts=None,
             *, H: int, W: int, K: int, use_ssim: bool, alpha: float,
             opt_poses: bool = False, sh_degree: int = 0,
             want_touched: bool = True, max_span: int = 4):
    """One mapping iteration over a stacked camera batch.

    st: Gaussian state; exp_state: (m, v) adam moments for exposure (B,2);
    tau_state: (m, v) adam moments for pose deltas (B,6);
    w2cs (B,4,4); images (B,H,W,3); depths (B,H,W); exposure (B,2);
    use_exposure (B,) bool (first mapped kf is the exposure reference);
    opt_pose_mask (B,) bool — cameras whose pose is optimized (first
    `pose_window` window frames, uid≠0 — reference mapper.py:1067-1095);
    lrs: dict of per-group learning rates (xyz already scheduled);
    cam_lrs: (lr_trans, lr_rot) traced scalars (reference multiplies the
    config lrs by 0.5, mapper.py:1080-1090);
    step: global iteration count (adam bias correction);
    iso_weight: isotropic regularizer weight (10.0 in map/init —
    mapper.py:487-489 — and 0.0 in final_refine, which has no such term,
    mapper.py:656-710).

    Pose handling matches monogs update_pose (pose_utils.py:81-98): the
    render always happens at tau=0 (deltas were retracted into w2c at the
    end of the previous iteration), the Adam step produces a new tau, and
    w2c ← exp(tau) ∘ w2c with tau reset to zero — all inside this program.

    Returns (st', exp_state', tau_state', w2cs', exposure',
             radii (B,C), n_touched (B,C), loss).
    """
    Bc = w2cs.shape[0]
    C = st.xyz.shape[0]
    bg = jnp.zeros(3)

    params = dict(xyz=st.xyz, f_dc=st.f_dc, f_rest=st.f_rest,
                  opacity=st.opacity, scaling=st.scaling,
                  rotation=st.rotation)
    taus = jnp.zeros((Bc, 6))

    def loss_fn(params, exposure, taus, dummy):
        opac = jax.nn.sigmoid(params["opacity"])[:, 0]
        scal = jnp.exp(params["scaling"])
        if sh_degree > 0:
            # view-dependent colors: SH evaluated toward each camera
            # (gaussian_renderer/__init__.py:99-116; render happens at
            # tau=0, so campos comes straight from w2c)
            campos = -jnp.einsum("bji,bj->bi", w2cs[:, :3, :3],
                                 w2cs[:, :3, 3])
            cols = jax.vmap(
                lambda cp: sh_ops.sh_colors(sh_degree, params["f_dc"],
                                            params["f_rest"],
                                            params["xyz"], cp))(campos)
        else:
            cols = jnp.clip(G.sh_to_rgb(params["f_dc"]), 0.0, None)

        # ONE batched render for the whole camera window (binning rides a
        # single multi-row sort; compositing folds cameras into tiles).
        # tile_ids/tile_counts: reuse a recent binning when given
        # (map_step_n rebins on a cadence — the sort was ~1/6 of a step).
        out = rz.rasterize_batch(
            params["xyz"], scal, params["rotation"], opac, cols,
            st.alive, w2cs, taus, intrinsics, bg,
            means2d_dummy=dummy, tile_ids=tile_ids,
            tile_counts=tile_counts, H=H, W=W, K=K,
            want_touched=want_touched, max_span=max_span)
        image_ab = jnp.where(
            use_exposure[:, None, None, None],
            jnp.exp(exposure[:, 0, None, None, None]) * out.color
            + exposure[:, 1, None, None, None],
            out.color)
        per_cam = jax.vmap(partial(mapping_loss, alpha=alpha,
                                   use_ssim=use_ssim))(
            image_ab, out.depth, images, depths)
        total = jnp.sum(jnp.where(cam_valid, per_cam, 0.0))
        radii = out.radii * cam_valid[:, None]
        n_touched = out.n_touched * cam_valid[:, None]

        # isotropic scale regularizer (mapper.py:487-489)
        iso = jnp.abs(scal - scal.mean(-1, keepdims=True))
        iso = jnp.where(st.alive[:, None], iso, 0.0)
        total = total + iso_weight * iso.sum() / jnp.clip(
            3 * st.alive.sum(), 1)
        return total, (radii, n_touched)

    dummy = jnp.zeros((Bc, C, 2))
    argnums = (0, 1, 2, 3) if opt_poses else (0, 1, 3)
    (loss, (radii, n_touched)), grads = jax.value_and_grad(
        loss_fn, argnums=argnums, has_aux=True)(params, exposure, taus,
                                                dummy)
    if opt_poses:
        g_params, g_expo, g_tau, g_dummy = grads
    else:
        g_params, g_expo, g_dummy = grads

    # densification statistics: per-camera screen-space gradient norms
    # accumulated over visible gaussians (mapper.py:522-529)
    vis_any = (radii > 0)
    gnorm = jnp.linalg.norm(g_dummy, axis=-1)          # (B,C)
    st = dataclasses.replace(
        st,
        grad_accum=st.grad_accum + (gnorm * vis_any).sum(0),
        denom=st.denom + vis_any.sum(0).astype(jnp.float32),
        max_radii2D=jnp.maximum(st.max_radii2D,
                                (radii * vis_any).max(0)))

    st = G.adam_step(st, g_params, lrs, step)

    t = step.astype(jnp.float32)

    # exposure Adam (lr 0.01, torch defaults — mapper.py:1097-1110)
    m, v = exp_state
    ge = g_expo * (use_exposure & cam_valid)[:, None]
    m = 0.9 * m + 0.1 * ge
    v = 0.999 * v + 0.001 * ge * ge
    upd = 0.01 * (m / (1 - 0.9 ** t)) / (jnp.sqrt(v / (1 - 0.999 ** t)) + 1e-8)
    exposure = exposure - upd

    if opt_poses:
        # camera pose Adam + retraction (mapper.py:561-568, 1067-1095;
        # pose_utils.py:81-98). tau layout = [trans, rot] like
        # update_pose's cat([cam_trans_delta, cam_rot_delta]).
        pm = (opt_pose_mask & cam_valid)[:, None]
        tm, tv = tau_state
        gt_ = g_tau * pm
        tm = 0.9 * tm + 0.1 * gt_
        tv = 0.999 * tv + 0.001 * gt_ * gt_
        lr_vec = jnp.concatenate([
            jnp.broadcast_to(cam_lrs[0], (3,)),
            jnp.broadcast_to(cam_lrs[1], (3,))])
        upd_tau = lr_vec * (tm / (1 - 0.9 ** t)) / (
            jnp.sqrt(tv / (1 - 0.999 ** t)) + 1e-8)
        new_tau = jnp.where(pm, -upd_tau, 0.0)
        dT = jax.vmap(lambda tt: lie.to_matrix(lie.exp(tt)))(new_tau)
        w2cs = jnp.where(pm[:, :, None], dT @ w2cs, w2cs)
        tau_state = (tm, tv)

    return (st, (m, v), tau_state, w2cs, exposure, radii, n_touched,
            loss)


@partial(jax.jit, static_argnames=("H", "W", "K", "use_ssim", "lr_sched",
                                   "opt_poses", "sh_degree", "rebin_every",
                                   "rebin_margin", "max_span",
                                   "per_step_cams"))
def map_step_n(st: G.GaussianState, exp_state, tau_state, w2cs, images,
               depths, exposure, use_exposure, cam_valid, opt_pose_mask,
               intrinsics, lr_scalars, cam_lrs, step0, n_iters, iso_weight,
               *, H: int, W: int, K: int, use_ssim: bool,
               alpha: float, lr_sched=None, opt_poses: bool = False,
               sh_degree: int = 0, rebin_every: int = 8,
               rebin_margin: float = 4.0, max_span: int = 4,
               per_step_cams: bool = False):
    """`n_iters` mapping iterations in ONE device program.

    The per-dispatch host↔device round trip dominates wall-clock when the
    optimization loop is driven from Python (the reference's structure);
    fusing the loop with lax.fori_loop amortizes it away. The xyz learning
    rate is rescheduled per iteration on-device (lr_sched = (init, final,
    delay_mult, max_steps) scalars), other lrs are fixed scalars.

    Two more amortizations over the per-iteration reference structure
    (both measured on the profile of map_step at Replica scale):
      * tile binning (the multi-million-key sort, ~1/6 of a step) runs
        every `rebin_every` iterations with a `rebin_margin`-pixel
        footprint margin — means drift well under a pixel per Adam step
        at the reference learning rates, so the lists stay conservative;
      * the per-Gaussian n_touched accumulation (only consumed at
        densify/visibility gates) is skipped in the loop; the LAST
        iteration runs with a fresh binning and want_touched=True.

    per_step_cams: iteration i trains on camera row i ALONE (Bc=1) —
    the reference final_refine's one-random-frame-per-optimizer-step
    schedule (mapper.py:656-708), fused. The batched B·S minibatch
    variant measured 0.85 dB PSNR below this schedule at matched step
    counts (tools/refine_sampling_ab.py), so faithful sampling is the
    production refine path. Requires n_iters == w2cs.shape[0]; each step
    re-bins its own camera (margin 0 — the binning is exact per step).
    """
    lrs_fixed = lr_scalars
    Bc, C = w2cs.shape[0], st.xyz.shape[0]
    ntx = (W + 15) // 16
    nty = (H + 15) // 16
    T = ntx * nty

    def lrs_at(step):
        if lr_sched is not None:
            xyz_lr = G.xyz_lr(step.astype(jnp.float32), *lr_sched)
        else:
            xyz_lr = lrs_fixed["xyz"]
        return dict(lrs_fixed, xyz=xyz_lr)

    def rebin(st, w2cs, margin=rebin_margin):
        nb = w2cs.shape[0]
        # opacity HEADROOM for reused lists: the alpha-cutoff binning
        # radius grows with opacity, and opacity_lr=0.05 on the logit can
        # widen a footprint past the pixel margin within a rebin window
        # (worst after an opacity reset). Bin with the opacity bound it
        # could reach by the next rebin; margin=0 (exact per-step paths)
        # keeps the true opacity.
        logit = st.opacity[:, 0]
        if margin > 0:
            logit = logit + rebin_every * 0.05
        return rz.bin_batch(
            st.xyz, jnp.exp(st.scaling), st.rotation,
            jax.nn.sigmoid(logit), st.alive, w2cs,
            jnp.zeros((nb, 6)), intrinsics, H=H, W=W, K=K,
            margin=margin, max_span=max_span)

    if per_step_cams:
        # one camera per optimizer step: slice row i, step on it, scatter
        # the updated per-camera state back into the stack
        row = lambda x, i: jax.lax.dynamic_slice_in_dim(x, i, 1, axis=0)
        put = lambda x, r, i: jax.lax.dynamic_update_slice_in_dim(
            x, r, i, axis=0)

        def step_one(i, carry, want_touched):
            (st, (em, ev), (tm, tv), w2cs, exposure) = carry
            w2c_i = row(w2cs, i)
            tids, tcnt = rebin(st, w2c_i, margin=0.0)
            step = step0 + i
            (st, (em_i, ev_i), (tm_i, tv_i), w2c_o, exp_o, radii,
             n_touched, loss) = map_step(
                st, (row(em, i), row(ev, i)), (row(tm, i), row(tv, i)),
                w2c_i, row(images, i), row(depths, i), row(exposure, i),
                row(use_exposure, i), row(cam_valid, i),
                row(opt_pose_mask, i), intrinsics, lrs_at(step), cam_lrs,
                step + 1, iso_weight, tids, tcnt,
                H=H, W=W, K=K, use_ssim=use_ssim, alpha=alpha,
                opt_poses=opt_poses, sh_degree=sh_degree,
                want_touched=want_touched, max_span=max_span)
            carry = (st, (put(em, em_i, i), put(ev, ev_i, i)),
                     (put(tm, tm_i, i), put(tv, tv_i, i)),
                     put(w2cs, w2c_o, i), put(exposure, exp_o, i))
            return carry, (radii, n_touched, loss)

        carry = (st, exp_state, tau_state, jnp.asarray(w2cs),
                 jnp.asarray(exposure))
        carry = jax.lax.fori_loop(
            0, n_iters - 1,
            lambda i, c: step_one(i, c, want_touched=False)[0], carry)
        carry, (radii, n_touched, loss) = step_one(
            n_iters - 1, carry, want_touched=True)
        (st, exp_state, tau_state, w2cs, exposure) = carry
        return (st, exp_state, tau_state, w2cs, exposure, radii,
                n_touched, loss)

    def body(i, carry):
        (st, exp_state, tau_state, w2cs, exposure, tids, tcnt) = carry
        tids, tcnt = jax.lax.cond(
            i % rebin_every == 0,
            lambda: rebin(st, w2cs),
            lambda: (tids, tcnt))
        step = step0 + i
        (st, exp_state, tau_state, w2cs, exposure, _, _, _) = map_step(
            st, exp_state, tau_state, w2cs, images, depths, exposure,
            use_exposure, cam_valid, opt_pose_mask, intrinsics,
            lrs_at(step), cam_lrs, step + 1, iso_weight, tids, tcnt,
            H=H, W=W, K=K, use_ssim=use_ssim, alpha=alpha,
            opt_poses=opt_poses, sh_degree=sh_degree, want_touched=False,
            max_span=max_span)
        return (st, exp_state, tau_state, w2cs, exposure, tids, tcnt)

    init = (st, exp_state, tau_state, jnp.asarray(w2cs),
            jnp.asarray(exposure),
            jnp.zeros((Bc, T, K), jnp.int32), jnp.zeros((Bc, T), jnp.int32))
    # traced n_iters: ONE compiled program serves every segment length
    (st, exp_state, tau_state, w2cs, exposure, _, _) = jax.lax.fori_loop(
        0, n_iters - 1, body, init)
    # final iteration: fresh binning + touch counts for the gate logic
    step = step0 + n_iters - 1
    return map_step(
        st, exp_state, tau_state, w2cs, images, depths, exposure,
        use_exposure, cam_valid, opt_pose_mask, intrinsics, lrs_at(step),
        cam_lrs, step + 1, iso_weight,
        H=H, W=W, K=K, use_ssim=use_ssim, alpha=alpha,
        opt_poses=opt_poses, sh_degree=sh_degree, want_touched=True,
        max_span=max_span)


def deform_points(st: G.GaussianState, frame_id, w2c_new, w2c_old,
                  depth_new, depth_old, intrinsics, rigid: jnp.ndarray):
    """Deform the Gaussians anchored to `frame_id` (mapper.py:154-255).

    Single-keyframe wrapper over fusion.deform_points_batch (one
    implementation; the batched form is the production path)."""
    from .fusion import deform_points_batch
    return deform_points_batch(
        st, jnp.asarray([frame_id], jnp.int32), w2c_new[None],
        w2c_old[None], depth_new[None], depth_old[None], intrinsics,
        jnp.asarray(rigid)[None], jnp.ones((1,), bool))


# ---------------------------------------------------------------------------
# the mapper
# ---------------------------------------------------------------------------

class Mapper:
    def __init__(self, cfg, video, dataset, mono_loader=None, printer=None):
        self.cfg = cfg
        self.video = video
        self.dataset = dataset
        self.mono_loader = mono_loader or (lambda idx: None)
        self.printer = printer

        m = cfg["mapping"]
        tr = m["Training"]
        self.alpha = tr["alpha"]
        self.use_ssim = tr["ssim_loss"]
        self.init_itr_num = tr["init_itr_num"]
        self.init_gaussian_update = tr["init_gaussian_update"]
        self.init_gaussian_reset = tr["init_gaussian_reset"]
        self.init_gaussian_th = tr["init_gaussian_th"]
        self.cameras_extent = 6.0
        self.init_gaussian_extent = self.cameras_extent * tr["init_gaussian_extent"]
        self.mapping_itr_num = tr["mapping_itr_num"]
        self.gaussian_update_every = tr["gaussian_update_every"]
        self.gaussian_update_offset = tr["gaussian_update_offset"]
        self.gaussian_th = tr["gaussian_th"]
        self.gaussian_extent = self.cameras_extent * tr["gaussian_extent"]
        self.gaussian_reset = tr["gaussian_reset"]
        self.size_threshold = tr["size_threshold"]
        self.window_size = tr["window_size"]
        self.pose_window = tr["pose_window"]
        # in-mapper camera-pose optimization is gated exactly like the
        # reference: mapping.BA and not gt_camera (mapper.py:1076-1095)
        self.opt_poses_enabled = bool(m.get("BA", False)
                                      and not tr.get("gt_camera", False))
        self.lr_cam_rot = tr["lr"]["cam_rot_delta"]
        self.lr_cam_trans = tr["lr"]["cam_trans_delta"]
        self.edge_threshold = tr["edge_threshold"]
        self.kf_translation = tr["kf_translation"]
        self.kf_min_translation = tr["kf_min_translation"]
        self.kf_overlap = tr["kf_overlap"]
        self.kf_cutoff = tr.get("kf_cutoff", 0.4)
        self.prune_mode = tr["prune_mode"]
        self.move_points = m["move_points"]
        self.online_plotting = m.get("online_plotting", False)
        self.save_dir = None
        self.pcd_downsample = m["pcd_downsample"]
        self.pcd_downsample_init = m["pcd_downsample_init"]
        self.adaptive_pointsize = m["adaptive_pointsize"]
        self.point_size = m["point_size"]

        op = m["opt_params"]
        self.opt = op
        self.spatial_lr_scale = 6.0
        self.percent_dense = op["percent_dense"]

        self.H = cfg["cam"]["H_out"]
        self.W = cfg["cam"]["W_out"]
        self.K = m.get("raster_K", 256)
        # tile-binning cadence inside fused optimization segments (see
        # map_step_n): rebin every N iters with a footprint margin
        self.rebin_every = m.get("rebin_every", 8)
        # raster_health logging cadence (keyframes); the rasterizer's
        # two bounded-work caps (K contributors/tile, max_span tile
        # footprint) must never be a silent quality cliff
        self.health_every = m.get("health_every", 10)
        self._mapped_count = 0
        # binning footprint caps (ADVICE r1: configurable per call site —
        # exactness holds for radius <= 4*TILE px in training; eval
        # renders default to a wider window for fidelity)
        self.max_span = m.get("raster_max_span", 4)
        self.eval_max_span = m.get("eval_max_span", 8)
        # optional device mesh: shard every optimization segment's camera
        # batch over "cam" (data-parallel rasterization; the replicated
        # Gaussian map's gradients all-reduce over ICI). 0 = single chip.
        self.mesh = None
        n_mesh = int(m.get("mesh_devices", 0) or 0)
        if n_mesh > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            # Build the mesh from the platform computation actually runs
            # on: honor an explicit jax_default_device pin (the test
            # suite pins CPU while sitecustomize exposes the tunneled
            # TPU backend), falling back to the default backend.
            try:
                pin = jax.config.jax_default_device
                platform = (pin.platform if pin is not None
                            else jax.default_backend())
                devs = jax.devices(platform)
            except Exception:
                devs = jax.devices()
            if len(devs) >= n_mesh:
                self.mesh = Mesh(np.asarray(devs[:n_mesh]), ("cam",))
                self._shard_cam = NamedSharding(self.mesh,
                                                PartitionSpec("cam"))
                self._shard_repl = NamedSharding(self.mesh,
                                                 PartitionSpec())
                self.mesh_size = n_mesh
            else:
                print(f"[mapper] mesh_devices={n_mesh} requested but only "
                      f"{len(devs)} devices visible — running single-chip")
        # spherical_harmonics: True → sh_degree 3 (reference mapper.py:78-85)
        self.sh_degree = 3 if tr.get("spherical_harmonics", False) \
            else m["model_params"]["sh_degree"]
        cap = m.get("capacity", 1 << 17)
        self.st = G.make_state(cap, sh_degree=self.sh_degree)
        # device-resident per-keyframe visibility table (reference
        # mapper.py keeps occ_aware_visibility as host tensors; pulling
        # the (B,C) masks cost two bulk fetches per mapped keyframe over
        # the tunnel). Row layout: [0, buffer) keyframe uids, row buffer
        # = all-False read pad, row buffer+1 = write-drop target.
        self.occ_vis_dev = jnp.zeros((video.buffer + 2, cap), bool)
        # host upper bound of the alive-Gaussian count (refreshed from
        # the per-map() packed pull; add_next_kf's capacity check used to
        # pay its own device→host sync per keyframe)
        self._alive_ub = 0
        # deferred per-camera pull from the last _run_iters (see
        # _drain_pack) + its device-resident post-opt camera stack
        self._pending_pack = None
        self._last_w2cs = None

        self.iteration_count = 0
        self.cameras: dict[int, Camera] = {}
        self.viewpoints: dict[int, Camera] = {}
        self.current_window: list[int] = []
        self.depth_dict: dict[int, np.ndarray] = {}
        self.is_kf: dict[int, bool] = {}
        self.keyframe_idxs: list[int] = []
        self.video_idxs: list[int] = []
        self.exp_ab: dict[int, np.ndarray] = {}
        self.exp_mv: dict[int, np.ndarray] = {}  # exposure Adam moments
        self.mono_cache: dict[int, tuple] = {}   # frame_idx → device mono
        self.rng = jax.random.PRNGKey(cfg.get("setup_seed", 43))
        self.host_rng = np.random.RandomState(cfg.get("setup_seed", 43))
        self.initialized = False
        self.first_mapped_uid = None
        from ..utils.profiling import PhaseTimers
        self.timers = PhaseTimers()   # replaced by SLAM's shared timers

        self.intrinsics = jnp.asarray(dataset.get_intrinsic())

    # -- proxy depth fusion (mapper.py:258-301) -----------------------------

    def _mono_dev(self, frame_idx):
        """Mono-prior depth as a device-resident array, uploaded once per
        keyframe (the prior never changes after prediction)."""
        ent = self.mono_cache.get(frame_idx)
        if ent is None:
            mono = self.mono_loader(frame_idx)
            if mono is None:
                ent = (jnp.zeros((self.H, self.W), jnp.float32), False)
            else:
                ent = (jnp.asarray(mono, jnp.float32), True)
            self.mono_cache[frame_idx] = ent
        return ent

    def refresh_keyframes(self, pairs):
        """Batched get_w2c_and_depth (mapper.py:258-301) for
        [(video_idx, frame_idx), ...]: one device gather, one fusion
        program, one small host pull — instead of per-keyframe host
        erosion/inpainting with full-res depth round trips.

        Returns {video_idx: (fused_depth (device), w2c (np 4×4),
                             invalid bool)}.
        """
        if not pairs:
            return {}
        from . import fusion
        from ..ops.ba import _geom_bucket
        D = len(pairs)
        # base 1: the every-keyframe map.fuse path refreshes a SINGLE
        # pair — a base-8 bucket ran the full-res fusion pyramid on 8
        # rows (7 of them pads) per keyframe
        Dp = _geom_bucket(D, 1)
        idx_list = [v for v, _ in pairs] + [pairs[0][0]] * (Dp - D)
        monos, has = [], []
        for _, f in pairs:
            m, h = self._mono_dev(f)
            monos.append(m)
            has.append(h)
        monos += [monos[0]] * (Dp - D)
        has += [has[0]] * (Dp - D)

        s = self.video.state
        idxs = jnp.asarray(np.asarray(idx_list, np.int32))
        du, vm, po = fusion.gather_video_slices(
            s.disps_up, s.valid_depth_mask, s.poses, idxs)
        fused, w2c, sc, sh, invalid = fusion.fuse_proxy_depth(
            du, vm, po, _stack_jit(tuple(monos)),
            jnp.asarray(np.asarray(has, bool)))

        # scale/shift write-back + small-pull pack in ONE program (the
        # eager .at[].set / where / concat chain was ~15 dispatches per
        # refresh). Pad rows duplicate idx_list[0]; scatter order with
        # duplicate indices is unspecified, so they get an OOB index
        # (mode="drop") instead of a validity mask.
        sel_np = np.asarray(idx_list, np.int32)
        sel_np[D:] = self.video.buffer          # OOB → dropped
        sel_np[:D][~np.asarray(has[:D], bool)] = self.video.buffer
        s.depth_scale, s.depth_shift, small_dev = _refresh_writeback(
            s.depth_scale, s.depth_shift, sc, sh,
            jnp.asarray(sel_np), w2c, invalid)
        # ONE small host pull for the per-frame scalars + 4×4 poses
        small = np.asarray(small_dev)
        out = {}
        for i, (v, f) in enumerate(pairs):
            inval = bool(small[i, 16] > 0.5) or not has[i]
            out[v] = (fused[i], small[i, :16].reshape(4, 4), inval)
        return out

    def get_w2c_and_depth(self, video_idx, frame_idx, mono_depth=None):
        """Single-keyframe wrapper over refresh_keyframes (reference
        get_w2c_and_depth signature; mono comes from the device cache)."""
        res = self.refresh_keyframes([(video_idx, frame_idx)])
        return res[video_idx]

    # -- anchoring ----------------------------------------------------------

    def add_next_kf(self, video_idx, cam: Camera, depth_map, init=False):
        down = self.pcd_downsample_init if init else self.pcd_downsample
        self.rng, sub = jax.random.split(self.rng)
        max_new = _round_up(int(2.0 * self.H * self.W / down), 1024)
        depth_dev = jnp.asarray(depth_map)
        if self.adaptive_pointsize:
            # median on DEVICE: a host np.median(depth) fetch here drained
            # the async queue once per keyframe
            point_size = jnp.minimum(
                0.05, self.point_size * jnp.median(depth_dev))
        else:
            point_size = self.point_size
        new = G.anchor_points(sub, jnp.asarray(cam.image), depth_dev,
                              cam.w2c, self.intrinsics, down, point_size,
                              max_new)
        # capacity check from the HOST alive upper bound (_alive_ub:
        # refreshed by every map() packed pull, bumped by max_new per
        # insert) — the former (count, alive) pull cost a link round trip
        # per keyframe. The bound only overestimates (prunes shrink alive
        # between pulls), so growth never lags the true need.
        self._alive_ub += max_new
        while self._alive_ub > 0.9 * self.st.xyz.shape[0]:
            self.st = G.grow_capacity(self.st)
            self.occ_vis_dev = _grow_occ(self.occ_vis_dev)
        self.st = G.insert_points(self.st, new, video_idx)

    # -- rendering ----------------------------------------------------------

    def render(self, cam: Camera):
        self._drain_pack()
        out = _eval_render(
            self.st, _stack_jit((cam.w2c,)), self.intrinsics,
            H=self.H, W=self.W, K=self.K, sh_degree=self.sh_degree,
            max_span=self.eval_max_span)
        return rz.RenderOutput(
            color=out.color[0], depth=out.depth[0], alpha=out.alpha[0],
            radii=out.radii[0], n_touched=out.n_touched[0],
            means2d=out.means2d[0])

    def _pads(self):
        """Shared device pad arrays for camera-batch stacking (lazy,
        allocated once)."""
        if not hasattr(self, "_pad_cache"):
            self._pad_cache = (
                jnp.eye(4), jnp.zeros((self.H, self.W, 3)),
                jnp.zeros((self.H, self.W), jnp.float32))
        return self._pad_cache

    def render_batch(self, cams):
        """Render several cameras in ONE program (eval path; binning and
        compositing batch like the training step). Returns a RenderOutput
        whose fields are sliced to len(cams)."""
        self._drain_pack()
        B = len(cams)
        Bp = _round_up(B, 4)
        eye4, _, _ = self._pads()
        # ONE jitted stack: eager jnp.stack here was ~8 dispatches
        # (w2c is host numpy per camera — the stack uploads once)
        w2cs = _stack_jit(tuple([c.w2c for c in cams]
                                + [eye4] * (Bp - B)))
        out = _eval_render(
            self.st, w2cs, self.intrinsics,
            H=self.H, W=self.W, K=self.K, sh_degree=self.sh_degree,
            max_span=self.eval_max_span)
        return rz.RenderOutput(
            color=out.color[:B], depth=out.depth[:B], alpha=out.alpha[:B],
            radii=out.radii[:B], n_touched=out.n_touched[:B],
            means2d=out.means2d[:B])

    # -- optimization loops --------------------------------------------------

    def _lrs(self):
        it = self.iteration_count
        lr_init = self.opt["position_lr_init"] * self.spatial_lr_scale
        lr_final = self.opt["position_lr_final"] * self.spatial_lr_scale
        xyz = float(G.xyz_lr(jnp.asarray(float(it)), lr_init, lr_final,
                             self.opt["position_lr_delay_mult"],
                             self.opt["position_lr_max_steps"]))
        return dict(xyz=xyz,
                    f_dc=self.opt["feature_lr"],
                    f_rest=self.opt["feature_lr"] / 20.0,
                    opacity=self.opt["opacity_lr"],
                    scaling=self.opt["scaling_lr"] * self.spatial_lr_scale,
                    rotation=self.opt["rotation_lr"])

    def _stack_cams(self, cams):
        n = len(cams)
        # Hybrid batch buckets: exact (1,2,3) below 4 — the
        # 150-iteration init map must not render 4 cameras for its
        # single real one — and multiples of 4 above (pure powers of
        # two padded the steady Replica window of 12 cams to 16: +33%
        # dead rasterization in the dominant map.opt phase). Under a
        # mesh the bucket must also divide the "cam" axis → lcm.
        import math
        if self.mesh is None:
            # {1} ∪ multiples of 4: B=1 keeps the 150-iteration init map
            # honest (padding its single camera 4x quadruples the
            # dominant phase), but 2-3-camera windows (the first couple
            # keyframes only) pad to 4 — each extra bucket is a fresh
            # ~60-90 s remote compile of the big fused training program,
            # which costs far more than a few padded early frames.
            B = n if n == 1 else _round_up(n, 4)
        else:
            B = _round_up(n, math.lcm(4, self.mesh_size))
        pad = B - n
        # cached pad arrays + ONE jitted stack per tensor: eager
        # jnp.stack issues ~8 dispatches per call, and jnp.eye/zeros
        # are one more each
        eye4, zimg, zdep = self._pads()
        w2cs = _stack_jit(tuple([c.w2c for c in cams] + [eye4] * pad))
        imgs = _stack_jit(tuple([c.image for c in cams] + [zimg] * pad))
        deps = _stack_jit(tuple(
            [c.depth if c.depth is not None else zdep for c in cams]
            + [zdep] * pad))
        expo = jnp.asarray(np.asarray(
            [self.exp_ab.get(c.uid, np.zeros(2)) for c in cams]
            + [np.zeros(2)] * pad, np.float32))
        use_exp = jnp.asarray(np.asarray(
            [c.uid != self.first_mapped_uid for c in cams]
            + [False] * pad, bool))
        valid = jnp.asarray(np.asarray([True] * n + [False] * pad, bool))
        return w2cs, imgs, deps, expo, use_exp, valid

    def _run_iters(self, cams, iters, densify_cfg=None, store_expo=True,
                   opt_poses=False, n_window=0, iso_weight=10.0,
                   persist_exp_state=False, refine=False,
                   per_step=False):
        """Shared optimization loop: map/initialize_map/final_refine core.

        Iterations run fused on device (map_step_n); the loop only returns
        to the host at densify/reset boundaries, so a 60-iteration window
        optimization is 1-2 dispatches instead of 60.

        opt_poses: optimize camera pose deltas for the first
        min(pose_window, n_window) cameras (uid 0 excluded), retracting
        each iteration (reference mapper.py:561-568, 1067-1095).
        persist_exp_state: carry per-camera exposure Adam moments across
        calls (final_refine keeps ONE optimizer for the whole refinement,
        mapper.py:652-707; per-keyframe map() rebuilds it, :1067-1111).
        refine: no xyz lr schedule restart semantics change; geometry
        groups still train (the reference's final_refine steps the FULL
        gaussian optimizer, mapper.py:700-707).
        """
        if not cams:
            return None
        self._drain_pack()   # _stack_cams reads exp_ab + camera w2c
        if per_step and densify_cfg is not None:
            per_step = False     # densify gates need batched host events
        w2cs, imgs, deps, expo, use_exp, valid = self._stack_cams(cams)
        B = w2cs.shape[0]
        if per_step and (B != len(cams) or iters != B):
            raise ValueError(
                f"per_step needs a bucket-sized cam list == iters "
                f"(got {len(cams)} cams, bucket {B}, iters {iters})")
        if persist_exp_state:
            mv = [self.exp_mv.get(c.uid, np.zeros((2, 2))) for c in cams]
            mv += [np.zeros((2, 2))] * (B - len(cams))
            mv = np.asarray(mv, np.float32)
            exp_m = jnp.asarray(mv[:, 0])
            exp_v = jnp.asarray(mv[:, 1])
        else:
            exp_m = jnp.zeros_like(expo)
            exp_v = jnp.zeros_like(expo)
        tau_m = jnp.zeros((B, 6))
        tau_v = jnp.zeros((B, 6))
        n_opt = min(self.pose_window, n_window) if opt_poses else 0
        pose_mask_host = np.asarray(
            [i < n_opt and cams[i].uid != 0 for i in range(len(cams))]
            + [False] * (B - len(cams)))
        pose_mask = jnp.asarray(pose_mask_host)
        cam_lrs = (jnp.asarray(0.5 * self.lr_cam_trans),
                   jnp.asarray(0.5 * self.lr_cam_rot))
        if self.mesh is not None:
            # data-parallel over "cam": per-camera tensors sharded, the
            # Gaussian map replicated (gradient all-reduce rides ICI).
            # map_step_n's outputs keep these shardings, so one placement
            # before the loop covers every fused segment.
            shard = lambda x: jax.device_put(x, self._shard_cam)
            w2cs, imgs, deps, expo = (shard(w2cs), shard(imgs),
                                      shard(deps), shard(expo))
            use_exp, valid, pose_mask = (shard(use_exp), shard(valid),
                                         shard(pose_mask))
            exp_m, exp_v = shard(exp_m), shard(exp_v)
            tau_m, tau_v = shard(tau_m), shard(tau_v)
            self.st = jax.device_put(self.st, self._shard_repl)
        last = None

        lr_sched = (self.opt["position_lr_init"] * self.spatial_lr_scale,
                    self.opt["position_lr_final"] * self.spatial_lr_scale,
                    self.opt["position_lr_delay_mult"],
                    self.opt["position_lr_max_steps"])
        lrs_fixed = dict(xyz=0.0,
                         f_dc=self.opt["feature_lr"],
                         f_rest=self.opt["feature_lr"] / 20.0,
                         opacity=self.opt["opacity_lr"],
                         scaling=self.opt["scaling_lr"] * self.spatial_lr_scale,
                         rotation=self.opt["rotation_lr"])

        def host_events(it):
            """Host work needed at iteration `it`? (densify/reset gates)"""
            if densify_cfg is None:
                return False
            d = densify_cfg
            if d.get("update_every") and \
                    it % d["update_every"] == d.get("update_offset", 0):
                return True
            if it in d.get("reset_at", ()):
                return True
            if d.get("reset_every") and it % d["reset_every"] == 0:
                return True
            return False

        done = 0
        while done < iters:
            # run until the next host event (or the end), in one dispatch
            seg = 1
            while (done + seg < iters
                   and not host_events(self.iteration_count + seg)):
                seg += 1
            seg_b = seg
            (self.st, (exp_m, exp_v), (tau_m, tau_v), w2cs, expo, radii,
             n_touched, loss) = map_step_n(
                self.st, (exp_m, exp_v), (tau_m, tau_v), w2cs, imgs, deps,
                expo, use_exp, valid, pose_mask, self.intrinsics,
                lrs_fixed, cam_lrs,
                jnp.asarray(self.iteration_count), jnp.asarray(seg_b),
                jnp.asarray(iso_weight),
                H=self.H, W=self.W, K=self.K, use_ssim=self.use_ssim,
                alpha=self.alpha, lr_sched=lr_sched, opt_poses=opt_poses,
                sh_degree=self.sh_degree, rebin_every=self.rebin_every,
                max_span=self.max_span, per_step_cams=per_step)
            self.iteration_count += seg_b
            done += seg_b
            last = (radii, n_touched, loss)
            if densify_cfg is not None:
                self._handle_host_events(densify_cfg, n_touched)
        if (store_expo or persist_exp_state or (opt_poses and n_opt)
                or densify_cfg is not None):
            # densify_cfg runs grow the true alive count (clone/split), so
            # they MUST refresh the packed alive bound — initialize_map
            # (store_expo=False, no pose opt) otherwise leaves _alive_ub
            # stale and add_next_kf's pull-free capacity check can lag the
            # real occupancy until the first map() pack drains.
            # DEFERRED packed device→host pull for all per-camera
            # outputs: the copy starts asynchronously here and is applied
            # by _drain_pack() at the next host consumer (usually the
            # next keyframe) — a blocking np.asarray at this point was a
            # full pipeline sync per mapped keyframe (one link RTT plus
            # serialization of ~400 ms of queued map_step work).
            packed_dev = _pack_cam_outputs(
                expo, exp_m, exp_v, w2cs, n_touched, self.st.alive)
            try:
                packed_dev.copy_to_host_async()
            except Exception:
                pass
            self._pending_pack = dict(
                dev=packed_dev, cams=list(cams), B=B, iters=iters,
                C_cap=self.st.xyz.shape[0], store_expo=store_expo,
                persist=persist_exp_state, n_opt=n_opt,
                pose_mask=pose_mask_host)
        # post-optimization camera poses stay ON DEVICE for the prune
        # pass (map(prune=True) renders with them without draining the
        # pending pack)
        self._last_w2cs = (tuple(c.uid for c in cams), w2cs)
        return last

    def _drain_pack(self):
        """Apply the deferred per-camera pull from the last _run_iters
        (exposure params + Adam moments, optimized poses, alive bound,
        flops accounting). Idempotent; ~free once the async copy has
        landed."""
        p = self._pending_pack
        if p is None:
            return
        self._pending_pack = None
        packed = np.asarray(p["dev"])
        cams, B, iters = p["cams"], p["B"], p["iters"]
        # host alive bound (consumed by add_next_kf's pull-free capacity
        # check)
        self._alive_ub = int(packed[0, 23])
        # flops model per iteration: ~110 F per blend pair (fwd alpha
        # eval + composite ≈ 30, bwd suffix-scan grads ≈ 80), plus
        # projection fwd+bwd ≈ 500 F per (camera, gaussian) row and
        # the SSIM/L1 loss ≈ 1.5 kF per (camera, pixel). packed[0, 22]
        # carries Σ n_touched of the final iteration.
        loss_f = 1500.0 if self.use_ssim else 200.0
        self.video.flops_mapping += float(iters) * (
            float(packed[0, 22]) * 110.0
            + B * p["C_cap"] * 500.0 + B * self.H * self.W * loss_f)
        if p["store_expo"]:
            for i, c in enumerate(cams):
                self.exp_ab[c.uid] = packed[i, 0:2]
        if p["persist"]:
            for i, c in enumerate(cams):
                self.exp_mv[c.uid] = np.stack(
                    [packed[i, 2:4], packed[i, 4:6]])
        if p["n_opt"]:
            for i, c in enumerate(cams):
                if p["pose_mask"][i]:
                    c.w2c = packed[i, 6:22].reshape(4, 4).copy()

    def _handle_host_events(self, d, n_touched):
        """Densify/prune + opacity resets at gate iterations (the `elif`
        structure matches mapper.py:531-556)."""
        it = self.iteration_count
        update = (d.get("update_every")
                  and it % d["update_every"] == d.get("update_offset", 0))
        if update:
            self.rng, sub = jax.random.split(self.rng)
            self.st = G.densify_and_prune(
                self.st, sub, self.opt["densify_grad_threshold"], d["th"],
                d["extent"], d["size_threshold"], self.percent_dense)
        elif d.get("reset_every") and it % d["reset_every"] == 0:
            # reset the opacity of gaussians not visible in the current
            # window (mapper.py:548-556)
            vis_any = np.asarray(n_touched[:d["n_window"]] > 0).any(0)
            self.st = G.reset_opacity_nonvisible(self.st,
                                                 jnp.asarray(vis_any))
        if it in d.get("reset_at", ()):
            self.st = G.reset_opacity(self.st)

    def initialize_map(self, video_idx, cam: Camera):
        """First-keyframe optimization (mapper.py:303-398)."""
        out = self._run_iters(
            [cam], self.init_itr_num,
            densify_cfg=dict(update_every=self.init_gaussian_update,
                             update_offset=0, th=self.init_gaussian_th,
                             extent=self.init_gaussian_extent,
                             size_threshold=None,
                             reset_at=(self.init_gaussian_reset,
                                       self.opt["densify_from_iter"])),
            store_expo=False)
        _, n_touched, _ = out
        self.occ_vis_dev = _occ_scatter(
            self.occ_vis_dev, n_touched[:1],
            jnp.asarray(np.asarray([video_idx], np.int32)))
        return out

    def _occ_idx(self, window, nrows):
        """(write uids (nrows,), read uids (window_size,)) for the device
        visibility table: write pads are OOB (dropped), read pads hit the
        all-False row `buffer`."""
        buf = self.video.buffer
        u = np.full(nrows, buf + 2, np.int32)
        nw = min(len(window), nrows)   # nrows=0 → read-only caller
        u[:nw] = window[:nw]
        wu = np.full(self.window_size, buf, np.int32)
        wu[:len(window)] = window
        return (jnp.asarray(u), jnp.asarray(wu))

    def map(self, window, prune=False, iters=1):
        """Window optimization (mapper.py:400-614).

        All `iters` iterations run fused on device; the loop surfaces to
        the host only at densify/reset gates. Like the reference, the two
        extra random past keyframes are drawn once per map() call
        (mapper.py:404-420 builds the stacks before the iteration loop).
        """
        if len(window) == 0:
            return
        cams = [self.viewpoints[k] for k in window]
        others = [v for k, v in self.viewpoints.items() if k not in window]
        if others:
            # host RNG: a jax.random.permutation here costs a device
            # dispatch + queue-draining fetch per mapped keyframe
            pick = self.host_rng.permutation(len(others))[:2]
            cams = cams + [others[int(i)] for i in pick]

        if prune:
            # The reference's prune pass renders + computes visibility but
            # returns BEFORE optimizer.step() (mapper.py:502-520 vs :557)
            # — so a forward-only batched render is both faithful and ~3x
            # cheaper than a full fwd+bwd+Adam map_step here. It still
            # counts as an iteration (mapper.py:415 increments first).
            self.iteration_count += 1
            lw = self._last_w2cs
            if lw is not None and lw[0][:len(window)] == tuple(
                    self.viewpoints[k].uid for k in window):
                # render with the preceding map() call's POST-optimization
                # poses straight from the device stack: numerically what
                # render_batch would use after the pull, with no drain of
                # the deferred pack (rows beyond the window are the two
                # random cams; their visibility rows are dropped by the
                # OOB write uids below, matching render_batch's pads)
                out = _eval_render(self.st, lw[1], self.intrinsics,
                                   H=self.H, W=self.W, K=self.K,
                                   sh_degree=self.sh_degree,
                                   max_span=self.eval_max_span)
            else:
                out = self.render_batch(
                    [self.viewpoints[k] for k in window])
            uids, wuids = self._occ_idx(window, out.n_touched.shape[0])
            if len(window) == self.window_size and \
                    self.prune_mode == "slam":
                # visibility scatter + observation-count prune in ONE
                # program — the reference pulls the (B,C) masks to host
                # and uploads n_obs back (mapper.py:502-557)
                sorted_w = sorted(window, reverse=True)
                self.st, self.occ_vis_dev = _occ_scatter_and_prune(
                    self.st, self.occ_vis_dev, out.n_touched, uids,
                    wuids, np.asarray(sorted_w[2], np.int32))
            else:
                self.occ_vis_dev = _occ_scatter(
                    self.occ_vis_dev, out.n_touched, uids)
            return False

        out = self._run_iters(
            cams, iters,
            densify_cfg=dict(update_every=self.gaussian_update_every,
                             update_offset=self.gaussian_update_offset,
                             th=self.gaussian_th,
                             extent=self.gaussian_extent,
                             size_threshold=self.size_threshold,
                             reset_every=self.gaussian_reset,
                             n_window=len(window)),
            opt_poses=self.opt_poses_enabled, n_window=len(window))
        _, n_touched, _ = out
        # window visibility stays ON DEVICE (pulling the (B,C) masks cost
        # a bulk fetch per mapped keyframe; the decision logic only ever
        # needs overlap COUNTS, computed in _fuse_and_gate)
        uids, _ = self._occ_idx(window, n_touched.shape[0])
        self.occ_vis_dev = _occ_scatter(self.occ_vis_dev, n_touched, uids)
        return True

    def final_refine(self, iters=26000):
        """Global refinement (mapper.py:617-710): re-fuse depth/poses,
        deform once more, then optimize ALL Gaussian params + exposure on
        random frames (the reference steps the full gaussian optimizer,
        mapper.py:700-707; its loss has no isotropic term and it never
        densifies)."""
        self._refresh_and_deform(
            list(zip(self.video_idxs, self.keyframe_idxs)))

        vps = list(self.viewpoints.values())
        rng = np.random.RandomState(0)
        # The reference runs `iters` single-random-frame OPTIMIZER steps
        # (mapper.py:656-708). Production path: S of those steps fused
        # per dispatch, step i training on its OWN random frame
        # (map_step_n per_step_cams) — the reference's exact sampling
        # schedule at 1/S the dispatch count. The B-frame minibatch
        # variant (refine_batch > 1, per-dispatch frames shared across S
        # steps) measured 0.85 dB PSNR BELOW this schedule at matched
        # Adam step counts (tools/refine_sampling_ab.py), so it is opt-in
        # only (refine_batch > 1). The faithful schedule also runs under
        # a camera mesh: the S per-step rows shard the "cam" axis and
        # each step's single camera is gathered by GSPMD.
        B = min(int(self.cfg["mapping"].get("refine_batch", 1)), len(vps))
        S = int(self.cfg["mapping"].get("refine_fused_steps", 8))
        per_step = (B == 1)
        if per_step:
            # per-step rows must fill the _stack_cams bucket exactly
            # ({1} ∪ multiples of 4 on single chip), else _run_iters'
            # bucket check rejects the stack
            S = 1 if S == 1 else _round_up(S, 4)
            if self.mesh is not None:
                # per-step rows ride the "cam" mesh axis as the batch dim
                # (each step's single camera is gathered from its shard by
                # GSPMD — dynamic_slice over a sharded axis); S must fill
                # the mesh bucket so the row stack shards evenly.
                import math
                S = _round_up(S, math.lcm(4, self.mesh_size))
        done = 0
        while done < iters:
            if per_step:
                # S uniform picks, one per optimizer step. WITHOUT
                # replacement within one dispatch when possible: duplicate
                # rows load the same per-uid exposure Adam state and only
                # the last row's update survives the store-back, silently
                # dropping a step's exposure update (advisor r3).
                if len(vps) >= S:
                    pick = rng.choice(len(vps), size=S, replace=False)
                else:
                    pick = rng.randint(0, len(vps), size=S)
                self._run_iters([vps[i] for i in pick], S, iso_weight=0.0,
                                persist_exp_state=True, per_step=True)
            else:
                pick = rng.randint(0, len(vps), size=B)
                self._run_iters([vps[i] for i in pick], S, iso_weight=0.0,
                                persist_exp_state=True)
            done += S

    # -- keyframe management (mapper.py:744-831) -----------------------------

    def is_keyframe(self, cur_idx, last_idx, gate, median_depth):
        """gate: the _fuse_and_gate count pack (cur_vis_sum, inter[k],
        occ_sum[k] vs the current window) — the masks themselves never
        leave the device (reference mapper.py:744-767 computes the same
        ratio from host tensors)."""
        curr = self.cameras[cur_idx]
        last = self.cameras[last_idx]
        # host numpy: w2c are host 4×4s; a jnp round trip here costs a
        # ~60 ms link RTT per keyframe
        dist = float(np.linalg.norm(
            (np.asarray(curr.w2c) @ np.linalg.inv(
                np.asarray(last.w2c)))[:3, 3]))
        dist_check = dist > self.kf_translation * median_depth
        dist_check2 = dist > self.kf_min_translation * median_depth
        cvs, inter, osum = gate
        # slot 0 of the window pack is last_idx (window[0])
        union = cvs + osum[0] - inter[0]
        ratio = inter[0] / max(union, 1)
        return (ratio < self.kf_overlap and dist_check2) or dist_check

    def add_to_window(self, cur_idx, gate, window):
        """gate counts are aligned with `window` slots BEFORE cur_idx is
        prepended (mapper.py:769-831)."""
        cvs, inter, osum = gate
        N_dont_touch = 2
        window = [cur_idx] + window
        curr = self.cameras[cur_idx]
        to_remove = []
        removed = None
        for i in range(N_dont_touch, len(window)):
            k = window[i]
            denom = max(min(cvs, osum[i - 1]), 1)
            if inter[i - 1] / denom <= self.kf_cutoff:
                to_remove.append(k)
        if to_remove:
            window.remove(to_remove[-1])
            removed = to_remove[-1]
        if len(window) > self.window_size:
            inv_dist = []
            kf0_wc = np.linalg.inv(np.asarray(curr.w2c))
            for i in range(N_dont_touch, len(window)):
                ki = self.cameras[window[i]]
                ki_cw = np.asarray(ki.w2c)
                dists = []
                for j in range(N_dont_touch, len(window)):
                    if i == j:
                        continue
                    kj_wc = np.linalg.inv(np.asarray(
                        self.cameras[window[j]].w2c))
                    dists.append(1.0 / (np.linalg.norm(
                        (ki_cw @ kj_wc)[:3, 3]) + 1e-6))
                k = np.sqrt(np.linalg.norm((ki_cw @ kf0_wc)[:3, 3]))
                inv_dist.append(k * sum(dists))
            idx = int(np.argmax(inv_dist))
            removed = window[N_dont_touch + idx]
            window.remove(removed)
        return window, removed

    # -- main entry (mapper.py:834-1116) -------------------------------------

    def _refresh_and_deform(self, pairs, skip_frame_idx=None):
        """Refresh poses/depths for `pairs` [(video_idx, frame_idx), ...]
        and deform the Gaussians anchored to them — the keyframe-refresh
        loop of mapper.py:1021-1055 (and final_refine's, :621-648), with
        the per-keyframe host fusion + per-keyframe deform dispatch
        replaced by ONE batched fusion program and ONE batched deform."""
        # cameras' w2c feeds w2c_old of the deform — a deferred pose-opt
        # pull must land first, and the refreshed poses written below
        # must not be clobbered by a later drain
        self._drain_pack()
        from . import fusion
        from ..ops.ba import _geom_bucket
        if not pairs:
            return
        res = self.refresh_keyframes(pairs)
        dirty = self.video.npc_dirty
        rows = []
        for v_idx, f_idx in pairs:
            depth_t, w2c_t, invalid_t = res[v_idx]
            dirty[v_idx] = False
            if v_idx not in self.depth_dict and \
                    self.is_kf.get(v_idx, False):
                self.depth_dict[v_idx] = depth_t
            if f_idx == skip_frame_idx:
                continue
            camk = self.cameras[v_idx]
            w2c_old = np.asarray(camk.w2c)
            camk.w2c = w2c_t
            camk.depth = depth_t
            if v_idx in self.viewpoints:
                self.viewpoints[v_idx].w2c = w2c_t
                self.viewpoints[v_idx].depth = depth_t
            if self.move_points and self.is_kf.get(v_idx, False):
                old_d = self.depth_dict.get(v_idx, depth_t)
                rows.append((v_idx, w2c_t, w2c_old, depth_t, old_d,
                             invalid_t))
                self.depth_dict[v_idx] = depth_t
        if not rows:
            return
        D = len(rows)
        Dp = _geom_bucket(D, 1)
        pad = rows[0]
        rows = rows + [pad] * (Dp - D)
        self.st = fusion.deform_points_batch(
            self.st,
            jnp.asarray(np.asarray([r[0] for r in rows], np.int32)),
            jnp.asarray(np.stack([r[1] for r in rows])),
            jnp.asarray(np.stack([r[2] for r in rows])),
            _stack_jit(tuple(r[3] for r in rows)),
            _stack_jit(tuple(r[4] for r in rows)),
            self.intrinsics,
            jnp.asarray(np.asarray([bool(r[5]) for r in rows])),
            jnp.asarray(np.arange(Dp) < D))

    def process_keyframe(self, frame_idx, video_idx):
        """Handle one tracker keyframe; returns True if it was mapped."""
        # apply the previous keyframe's deferred per-camera pull (its
        # async copy landed during the tracking phase in between):
        # is_keyframe/add_to_window below read camera w2c, add_next_kf
        # reads the alive bound
        self._drain_pack()
        T = self.timers
        with T("map.load"):
            _, color, _, _ = self.dataset[frame_idx]
            self._mono_dev(frame_idx)
        self.keyframe_idxs.append(frame_idx)
        self.video_idxs.append(video_idx)

        with T("map.fuse"):
            # fusion + gate render + overlap counts in ONE program, ONE
            # small f32 pull (the gate outputs ride along even for the
            # first keyframe / invalid fusions — an unconditional ~10 ms
            # render is cheaper than a second compiled program + sync on
            # the steady path)
            mono, has = self._mono_dev(frame_idx)
            s = self.video.state
            sel = np.int32(video_idx if has else self.video.buffer)
            _, wuids = self._occ_idx(self.current_window, 0)
            (s.depth_scale, s.depth_shift, depth,
             packed_dev) = _fuse_and_gate(
                self.st, s.disps_up, s.valid_depth_mask, s.poses,
                s.depth_scale, s.depth_shift, mono,
                np.asarray(has, bool), np.int32(video_idx), sel,
                self.intrinsics, self.occ_vis_dev, wuids,
                H=self.H, W=self.W, K=self.K,
                sh_degree=self.sh_degree, max_span=self.eval_max_span)
            small = np.asarray(packed_dev)           # ONE device pull
            # achieved-FLOPs model: proxy-depth fusion ≈ 500 F/pixel
            # (erosion + push-pull pyramid + scale/shift align) and the
            # gate render ≈ one projection pass over capacity plus a
            # K-capped composite at ~25% mean tile occupancy
            self.video.flops_mapping += float(self.H * self.W) * (
                500.0 + 0.25 * self.K * 110.0) \
                + float(self.st.xyz.shape[0]) * 500.0
            w2c = small[:16].reshape(4, 4).copy()
            invalid = bool(small[16] > 0.5) or not has
            median_depth = float(small[17])
            Wmax = self.window_size
            gate = (float(small[18]),                # cur_vis count
                    small[19:19 + Wmax],             # inter per window slot
                    small[19 + Wmax:19 + 2 * Wmax])  # occ sums
        cam = make_camera(video_idx, color, depth, w2c)
        self.cameras[video_idx] = cam
        if invalid:
            self.is_kf[video_idx] = False
            return False

        if not self.initialized:
            self.initialized = True
            self.first_mapped_uid = video_idx
            self.current_window = [video_idx]
            self.depth_dict[video_idx] = depth
            self.is_kf[video_idx] = True
            self.viewpoints[video_idx] = cam
            with T("map.anchor"):
                self.add_next_kf(video_idx, cam, depth, init=True)
            with T("map.opt"):
                self.initialize_map(video_idx, cam)
            return True

        with T("map.render_gate"):
            if not np.isfinite(median_depth):
                d_np = np.asarray(depth)
                median_depth = float(np.median(d_np[d_np > 0])) \
                    if (d_np > 0).any() else 1.0
        last_idx = self.current_window[0]

        create_kf = self.is_keyframe(video_idx, last_idx, gate,
                                     median_depth)
        if len(self.current_window) < self.window_size:
            cvs, inter, osum = gate
            union = cvs + osum[0] - inter[0]
            create_kf = inter[0] / max(union, 1) < self.kf_overlap
        if not create_kf:
            self.is_kf[video_idx] = False
            return False

        self.current_window, _ = self.add_to_window(
            video_idx, gate, self.current_window)
        self.is_kf[video_idx] = True

        # refresh mapped keyframes' poses/depths and deform the map
        # (mapper.py:1021-1055). The reference re-fuses EVERY keyframe every
        # time (O(n²) host inpainting); we use the tracker's npc_dirty flags
        # (depth_video.py:49-50 — allocated there but never exploited) to
        # skip keyframes whose poses/depths did not change.
        last_frame_idx = self.keyframe_idxs[-1]
        dirty = self.video.npc_dirty
        with T("map.deform"):
            pairs = [(v, f)
                     for v, f in zip(self.video_idxs, self.keyframe_idxs)
                     if dirty[v] or v not in self.depth_dict
                     or f == last_frame_idx]
            self._refresh_and_deform(pairs, skip_frame_idx=last_frame_idx)

        self.viewpoints[video_idx] = cam
        with T("map.anchor"):
            self.add_next_kf(video_idx, cam, depth, init=False)

        with T("map.opt"):
            self.map(self.current_window, iters=self.mapping_itr_num)
            self.map(self.current_window, prune=True)
        self._mapped_count += 1
        if self.health_every and self._mapped_count % self.health_every == 0:
            self.log_raster_health()
        if self.online_plotting:
            self.plot_online(video_idx)
        return True

    def log_raster_health(self):
        """Accounting of the rasterizer's bounded-work caps over the
        current window (never silent — the CUDA reference has no caps).
        Warns when the tile-list overflow beyond K exceeds 1%."""
        self._drain_pack()
        cams = [self.viewpoints[k] for k in self.current_window
                if k in self.viewpoints]
        if not cams:
            return None
        from ..ops import rasterizer as rz
        w2cs = jnp.asarray(np.stack([np.asarray(c.w2c) for c in cams]))
        overflow, crop, max_count = rz.raster_health(
            self.st.xyz, G.get_scaling(self.st), self.st.rotation,
            G.get_opacity(self.st)[:, 0], self.st.alive, w2cs,
            jnp.zeros((w2cs.shape[0], 6)), self.intrinsics,
            H=self.H, W=self.W, K=self.K, max_span=self.max_span)
        packed = np.asarray(jnp.stack(
            [overflow, crop, max_count.astype(jnp.float32)]))  # ONE fetch
        overflow, crop, max_count = (float(packed[0]), float(packed[1]),
                                     int(packed[2]))
        msg = (f"raster health: tile overflow {overflow:.2%} "
               f"(K={self.K}, densest tile {max_count}), "
               f"max_span crop {crop:.2%}")
        emit = self.printer.print if self.printer else print
        if overflow > 0.01:
            emit(f"WARNING {msg} — overflow >1%: raise mapping.raster_K "
                 "or densify/prune more aggressively")
        else:
            emit(msg)
        return overflow, crop, max_count

    def plot_online(self, video_idx):
        """Per-keyframe RGB/depth/diff panel (mapper.py:358-396,570-612)."""
        self._drain_pack()
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        cam = self.viewpoints.get(video_idx)
        if cam is None:
            return
        out = self.render(cam)
        img = np.clip(np.asarray(out.color), 0, 1)
        gt = np.asarray(cam.image)
        dep = np.asarray(out.depth)
        gtd = np.asarray(cam.depth) if cam.depth is not None else dep * 0
        fig, ax = plt.subplots(2, 3, figsize=(12, 6))
        for a, (im, title) in zip(ax.flat, [
                (gt, "gt rgb"), (img, "render"),
                (np.abs(gt - img).mean(-1), "|diff|"),
                (gtd, "proxy depth"), (dep, "render depth"),
                (np.abs(gtd - dep), "|depth diff|")]):
            a.imshow(im)
            a.set_title(title)
            a.axis("off")
        plot_dir = os.path.join(self.save_dir or ".", "online_plots")
        os.makedirs(plot_dir, exist_ok=True)
        fig.savefig(os.path.join(plot_dir, f"{video_idx:05d}.png"), dpi=80)
        plt.close(fig)
