"""Device-side proxy-depth fusion + batched map refresh.

Reference: src/mapper.py:258-301 (get_w2c_and_depth) erodes and inpaints
the mono prior with scipy/cv2 on the CPU, and the keyframe-refresh loop
(mapper.py:1021-1055) repeats it for EVERY past keyframe after every pose
update — an O(n_keyframes) host excursion per mapped keyframe, each call
round-tripping full-resolution depth maps over the host↔device link.

Here the entire refresh is ONE batched device program:
  * outlier masking + 5× binary erosion = iterated 3×3 min-pool
    (scipy binary_erosion parity incl. the pad-with-ones border),
  * hole inpainting = push–pull pyramid fill — a smooth-interpolant
    stand-in for cv2.INPAINT_NS (radius 3): both produce a smooth
    completion of the sparse mono field; tests bound the fill error on
    smooth synthetic depth,
  * mono→multiview scale/shift alignment = the closed-form weighted LSQ
    already used everywhere else (ops/ba.py align_scale_and_shift),
and the Gaussian-map deformation for all refreshed keyframes is a second
single program (deform_points_batch) instead of one dispatch per keyframe
(mapper.py:154-255 update_mapping_points semantics).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.ba import align_scale_and_shift
from . import gaussians as G


def _erode3(m: jnp.ndarray) -> jnp.ndarray:
    """One 3×3 binary erosion with the border padded True
    (np.pad(..., constant_values=1) parity — mapper.py:281-283)."""
    mp = jnp.pad(m.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)),
                 constant_values=1.0)
    out = jax.lax.reduce_window(mp, jnp.inf, jax.lax.min,
                                (1, 3, 3), (1, 1, 1), "VALID")
    return out > 0.5


def push_pull_fill(x: jnp.ndarray) -> jnp.ndarray:
    """Fill x == 0 pixels with a smooth interpolation of x > 0 pixels.

    Push: average-pool (value·weight, weight) pyramids down to ~4 px.
    Pull: upsample the coarse fill and keep finer data where it exists.
    """
    w = (x > 0).astype(x.dtype)
    vals, wts = [x * w], [w]
    v, ww = x * w, w
    while min(v.shape[-2], v.shape[-1]) > 4:
        v = jax.lax.reduce_window(v, 0.0, jax.lax.add,
                                  (1, 2, 2), (1, 2, 2), "SAME")
        ww = jax.lax.reduce_window(ww, 0.0, jax.lax.add,
                                   (1, 2, 2), (1, 2, 2), "SAME")
        vals.append(v)
        wts.append(ww)
    fill = vals[-1] / jnp.clip(wts[-1], 1e-6)
    for lvl in range(len(vals) - 2, -1, -1):
        v, ww = vals[lvl], wts[lvl]
        up = jax.image.resize(fill, v.shape, "linear")
        fill = jnp.where(ww > 0, v / jnp.clip(ww, 1e-6), up)
    return fill


@partial(jax.jit, static_argnames=("erosion_iters",))
def fuse_proxy_depth(disps_up, valid_mask, poses_w2c, monos, has_mono,
                     erosion_iters: int = 5):
    """Batched proxy-depth fusion (get_w2c_and_depth device core).

    disps_up (B,H,W) upsampled tracker disparities; valid_mask (B,H,W)
    bool multiview-consistency mask; poses_w2c (B,7) SE3 vectors;
    monos (B,H,W) raw mono-prior depth; has_mono (B,) bool.

    Returns (fused (B,H,W), w2c (B,4,4), scale (B,), shift (B,),
             invalid (B,) bool).
    """
    est = 1.0 / jnp.clip(disps_up, 1e-8)
    est = jnp.where(valid_mask, est, 0.0)
    invalid = valid_mask.sum(axis=(1, 2)) < 100

    # outlier mask: mono > 4·mean (mean over ALL pixels — mapper.py:277)
    mono_mean = monos.mean(axis=(1, 2), keepdims=True)
    mono = jnp.where(monos > 4.0 * mono_mean, 0.0, monos)
    m = mono > 0
    for _ in range(erosion_iters):
        m = _erode3(m)
    mono = jnp.where(m, mono, 0.0)
    mono_filled = push_pull_fill(mono)

    w_align = (m & valid_mask).astype(jnp.float32)
    sc, sh, _ = align_scale_and_shift(mono_filled, est, w_align)
    do = has_mono & ~invalid
    sc = jnp.where(do, sc, 1.0)
    sh = jnp.where(do, sh, 0.0)
    mono_wq = mono_filled * sc[:, None, None] + sh[:, None, None]
    fused = jnp.where(valid_mask, est, mono_wq)
    fused = jnp.where(do[:, None, None], fused, est)

    w2c = jax.vmap(lie.to_matrix)(poses_w2c)
    return fused, w2c, sc, sh, invalid


@jax.jit
def gather_video_slices(disps_up, valid_mask, poses, idxs):
    """One-dispatch gather of the DepthVideo rows a refresh touches."""
    return disps_up[idxs], valid_mask[idxs], poses[idxs]


@jax.jit
def deform_points_batch(st: G.GaussianState, frame_ids, w2c_new, w2c_old,
                        depth_new, depth_old, intrinsics, rigid, active):
    """Deform Gaussians anchored to EVERY refreshed keyframe in one
    program (update_mapping_points semantics, mapper.py:154-255, applied
    per keyframe; slots are disjoint by kf_id so one pass is exact).

    frame_ids (D,) int32 keyframe ids (pad with -1); w2c_new/old (D,4,4);
    depth_new/old (D,H,W); rigid (D,) bool (invalid new depth → rigid
    move only); active (D,) bool row validity.
    """
    C = st.xyz.shape[0]
    fx, fy, cx, cy = intrinsics
    Hd, Wd = depth_new.shape[1:]

    eq = frame_ids[None, :] == st.kf_id[:, None]          # (C, D)
    eq = eq & active[None, :]
    found = eq.any(1) & st.alive
    slot = jnp.argmax(eq, 1)                              # (C,)

    Wn = w2c_new[slot]                                    # (C,4,4)
    Wo = w2c_old[slot]
    rig = rigid[slot]

    means = st.xyz
    cam_old = jnp.einsum("cij,cj->ci", Wo[:, :3, :3], means) + Wo[:, :3, 3]
    z = jnp.clip(cam_old[:, 2], 1e-6)
    u = fx * cam_old[:, 0] / z + cx
    v = fy * cam_old[:, 1] / z + cy
    ui = jnp.clip(u.astype(jnp.int32), 0, Wd - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, Hd - 1)
    d_new = depth_new[slot, vi, ui]
    d_old = depth_old[slot, vi, ui]

    rescale = 1.0 + (d_new - d_old) / z
    # out-of-frustum / behind-camera points must move rigidly: the
    # clamped (ui, vi) would otherwise read an unrelated border pixel's
    # depth and drag the point along its ray by a bogus rescale
    oob = ((cam_old[:, 2] <= 1e-6) | (u < 0) | (u > Wd - 1)
           | (v < 0) | (v > Hd - 1))
    bad = (d_new == 0) | (d_old == 0) | (rescale <= 0.0) | rig | oob
    rescale = jnp.where(bad, 1.0, rescale)

    cam_scaled = cam_old * rescale[:, None]
    # ONE batched inverse: Trel @ (c2w_old @ x) == c2w_new @ x, and
    # Trel itself is c2w_new @ w2c_old (the former nested-inverse form
    # compounded inversion error and cost two extra 4x4 inverses/row)
    c2w_new = jax.vmap(jnp.linalg.inv)(w2c_new)           # (D,4,4)
    Trel_d = c2w_new @ w2c_old
    Cn = c2w_new[slot]
    moved = jnp.einsum("cij,cj->ci", Cn[:, :3, :3], cam_scaled) \
        + Cn[:, :3, 3]
    new_xyz = jnp.where(found[:, None], moved, st.xyz)

    # rotate quaternions by each keyframe's relative transform (wxyz)
    q_rel_d = jax.vmap(lambda T: lie.matrix_to_quat(T[:3, :3]))(Trel_d)
    q_rel_d = jnp.concatenate([q_rel_d[:, 3:4], q_rel_d[:, :3]], -1)
    qr = q_rel_d[slot]
    w1, x1, y1, z1 = qr[:, 0], qr[:, 1], qr[:, 2], qr[:, 3]
    q = st.rotation
    w2, x2, y2, z2 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    q_new = jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)
    new_rot = jnp.where(found[:, None], q_new, st.rotation)
    new_scaling = jnp.where(found[:, None],
                            st.scaling + jnp.log(rescale)[:, None],
                            st.scaling)

    st = dataclasses.replace(st, xyz=new_xyz, rotation=new_rot,
                             scaling=new_scaling)
    # reference zeroes the Adam moments of every replaced tensor
    # (replace_tensor_to_optimizer, mapper.py:172-255)
    return G._zero_moments(st, found)
