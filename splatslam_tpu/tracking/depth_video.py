"""DepthVideo — the keyframe ring buffer, as a device-resident pytree.

TPU-native redesign of the reference's shared-memory CUDA tensor pool
(thirdparty/glorie_slam/depth_video.py:27-120). The reference shares
tensors between a tracker process and a mapper process and guards them
with a lock; here a single host thread owns one pytree of fixed-shape
jnp arrays, so the lock, the dirty-flag races, and the IPC disappear —
the keyframe-granularity handshake becomes plain function-call order.

All per-frame state lives in arrays with the buffer dimension first;
the keyframe counter and dirty flags are host-side (they drive control
flow, which must stay out of jit).

Kernel equivalents of the reference CUDA ops:
  * frame_distance — droid_kernels.cu:518-659 (flow-distance metric)
  * depth_filter   — droid_kernels.cu:661-777 (multiview consistency)
  * reproject      — pops.projective_transform (depth_video.py:170-178)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, projective as pops, ba as ba_ops
from ..ops.upsample import upsample_disp, upsample_disp_uniform

# the CUDA kernels use 0.25 (droid_kernels.cu:26); python ops use 0.2
CUDA_MIN_DEPTH = 0.25


def _pad_idx(ix, base=32, fill=None):
    """Pad an int index array to a geometric shape bucket.

    Varying index-array lengths would otherwise compile a fresh XLA
    program per length — per keyframe, in practice. `fill` defaults to
    the first element (harmless duplicate work whose output is sliced
    off / scattered with mode=drop)."""
    ix = np.asarray(ix).reshape(-1)
    n = ix.shape[0]
    b = ba_ops._geom_bucket(max(n, 1), base)
    if fill is None:
        fill = ix[0] if n else 0
    out = np.full(b, fill, ix.dtype if ix.size else np.int64)
    out[:n] = ix
    return out, n


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VideoState:
    """Fixed-capacity per-keyframe state (buffer dim first)."""
    timestamp: jnp.ndarray      # (B,) f32
    images: jnp.ndarray         # (B, H, W, 3) uint8
    poses: jnp.ndarray          # (B, 7) f32 — world-to-camera SE3
    disps: jnp.ndarray          # (B, h, w) f32 — 1/8-res disparity
    disps_up: jnp.ndarray       # (B, H, W) f32
    intrinsics: jnp.ndarray     # (B, 4) f32 — at 1/8 resolution
    mono_disps: jnp.ndarray     # (B, h, w) f32
    depth_scale: jnp.ndarray    # (B,) f32
    depth_shift: jnp.ndarray    # (B,) f32
    valid_depth_mask: jnp.ndarray        # (B, H, W) bool
    valid_depth_mask_small: jnp.ndarray  # (B, h, w) bool
    fmaps: jnp.ndarray          # (B, h, w, 128) bf16 — correlation features
    nets: jnp.ndarray           # (B, h, w, 128) f32 — GRU hidden seed
    inps: jnp.ndarray           # (B, h, w, 128) f32 — context features
    gt_poses: jnp.ndarray       # (B, 7) f32 — GT w2c (oracle/eval only)
    gt_disps: jnp.ndarray       # (B, h, w) f32 — GT disparity (oracle only)


def make_video_state(buffer: int, H: int, W: int, down: int = 8) -> VideoState:
    h, w = H // down, W // down
    return VideoState(
        timestamp=jnp.zeros((buffer,), jnp.float32),
        images=jnp.zeros((buffer, H, W, 3), jnp.uint8),
        poses=lie.identity((buffer,)),
        disps=jnp.ones((buffer, h, w), jnp.float32),
        disps_up=jnp.zeros((buffer, H, W), jnp.float32),
        intrinsics=jnp.zeros((buffer, 4), jnp.float32),
        mono_disps=jnp.zeros((buffer, h, w), jnp.float32),
        depth_scale=jnp.zeros((buffer,), jnp.float32),
        depth_shift=jnp.zeros((buffer,), jnp.float32),
        valid_depth_mask=jnp.zeros((buffer, H, W), bool),
        valid_depth_mask_small=jnp.zeros((buffer, h, w), bool),
        fmaps=jnp.zeros((buffer, h, w, 128), jnp.bfloat16),
        nets=jnp.zeros((buffer, h, w, 128), jnp.float32),
        inps=jnp.zeros((buffer, h, w, 128), jnp.float32),
        gt_poses=lie.identity((buffer,)),
        gt_disps=jnp.ones((buffer, h, w), jnp.float32),
    )


# ---------------------------------------------------------------------------
# jitted geometric kernels
# ---------------------------------------------------------------------------

@jax.jit
def frame_distance_kernel(poses, disps, intrinsics, ii, jj, beta):
    """Mean induced-flow distance (droid_kernels.cu frame_distance parity).

    dist = mean over valid pixels of β·‖flow(SE3)‖ + (1−β)·‖flow(t-only)‖;
    returns 1000 when fewer than 75% of pixels are valid.
    poses (B,7), disps (B,h,w), intrinsics (4,), ii/jj (N,) → (N,).
    """
    h, w = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics
    grid = pops.coords_grid(h, w)
    d_i = disps[ii]                                    # (N,h,w)
    X = (grid[..., 0] - cx) / fx
    Y = (grid[..., 1] - cy) / fy
    ones = jnp.ones_like(d_i)
    Xi = jnp.stack([X * ones, Y * ones, ones, d_i], -1)

    Gij = lie.mul(poses[jj], lie.inv(poses[ii]))       # (N,7)
    Xj_full = lie.act(Gij[:, None, None], Xi)
    tij = Gij[:, None, None, :3]
    Xj_t = Xi.at[..., :3].add(Xi[..., 3:4] * tij)

    def flow_mag(Xj):
        u = fx * Xj[..., 0] / Xj[..., 2] + cx
        v = fy * Xj[..., 1] / Xj[..., 2] + cy
        d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)
        valid = Xj[..., 2] > CUDA_MIN_DEPTH
        return d, valid

    d1, v1 = flow_mag(Xj_full)
    d2, v2 = flow_mag(Xj_t)
    accum = (beta * jnp.sum(d1 * v1, (-2, -1))
             + (1 - beta) * jnp.sum(d2 * v2, (-2, -1)))
    valid = (beta * jnp.sum(v1, (-2, -1))
             + (1 - beta) * jnp.sum(v2, (-2, -1)))
    total = jnp.asarray(h * w, jnp.float32)
    frac = valid / (total + 1e-8)
    return jnp.where(frac < 0.75, 1000.0, accum / jnp.clip(valid, 1e-8))


@jax.jit
def depth_filter_kernel(poses, disps, intrinsics, inds, thresh):
    """Multiview consistency counter (droid_kernels.cu depth_filter parity).

    For each frame ix in `inds` and each of its 6 neighbor frames
    jx ∈ {ix−1, ix−2, ix−3, ix+3, ix+4, ix+5} (the reference's exact
    neighbor set), count whether the reprojected inverse depth agrees with
    any of the 4 integer-neighbor disparities within thresh[ix].
    Returns (len(inds), h, w) float counts.
    """
    num, h, w = disps.shape
    fx, fy, cx, cy = intrinsics
    grid = pops.coords_grid(h, w)

    def per_frame(ix, t):
        def one(jx):
            valid_j = (jx >= 0) & (jx < num)
            jx_c = jnp.clip(jx, 0, num - 1)
            d_i = disps[ix]
            X = (grid[..., 0] - cx) / fx
            Y = (grid[..., 1] - cy) / fy
            Xi = jnp.stack([X, Y, jnp.ones_like(d_i), d_i], -1)
            Gij = lie.mul(poses[jx_c], lie.inv(poses[ix]))
            Xj = lie.act(Gij, Xi)
            uj = fx * Xj[..., 0] / Xj[..., 2] + cx
            vj = fy * Xj[..., 1] / Xj[..., 2] + cy
            dj = Xj[..., 3] / Xj[..., 2]
            u0 = jnp.floor(uj).astype(jnp.int32)
            v0 = jnp.floor(vj).astype(jnp.int32)
            inb = (u0 >= 0) & (v0 >= 0) & (u0 < w - 1) & (v0 < h - 1)
            u0c = jnp.clip(u0, 0, w - 2)
            v0c = jnp.clip(v0, 0, h - 2)
            dmap = disps[jx_c]
            agree = jnp.zeros_like(d_i, bool)
            for dv in (0, 1):
                for du in (0, 1):
                    dn = dmap[v0c + dv, u0c + du]
                    agree = agree | (jnp.abs(1.0 / dj - 1.0 / dn) < t)
            return (agree & inb & valid_j).astype(jnp.float32)

        neighbors = jnp.stack([ix - 1, ix - 2, ix - 3, ix + 3, ix + 4, ix + 5])
        counts = jnp.zeros((h, w), jnp.float32)
        for k in range(6):
            counts = counts + one(neighbors[k])
        return counts

    return jax.vmap(per_frame)(inds, thresh)


@partial(jax.jit, static_argnames=("thresh_mult", "visible_num",
                                   "intr_scale"))
def _valid_mask_kernel(poses, disps_full, mask, intr0, idx, *,
                       thresh_mult: float, visible_num: int,
                       intr_scale: float):
    """Multiview-filter mask refresh as ONE program: gather + threshold +
    depth_filter + nanmedian gate + scatter (was ~12 eager dispatches per
    update_valid_depth_mask call)."""
    buffer = disps_full.shape[0]
    idx_safe = jnp.clip(idx, 0, buffer - 1)
    disps = disps_full[idx_safe]
    intr = intr0 * intr_scale
    depths = 1.0 / jnp.clip(disps, 1e-8)
    thresh = thresh_mult * depths.mean(axis=(1, 2))
    count = depth_filter_kernel(poses, disps_full, intr, idx_safe, thresh)
    multiview = count >= visible_num
    depths_mv = jnp.where(multiview, depths, jnp.nan)
    med = jnp.nanmedian(depths_mv.reshape(idx.shape[0], -1), axis=1)
    masks = multiview & (depths < 3 * med[:, None, None])
    return mask.at[idx].set(masks, mode="drop")


@jax.jit
def reproject_kernel(poses, disps, intrinsics, ii, jj):
    """Project pixels of frames ii into frames jj (depth_video.py:170-178).

    intrinsics: (4,) shared across frames — broadcast to the per-frame
    table projective_transform expects (it indexes intrinsics[:, ii])."""
    intr_t = jnp.broadcast_to(intrinsics, (poses.shape[0], 4))
    coords, valid = pops.projective_transform(
        poses[None], disps[None], intr_t[None], ii, jj)
    return coords[0], valid[0]


@jax.jit
def upsample_kernel(disps_sel, upmask):
    """8× convex upsampling of selected disparity maps."""
    return upsample_disp(disps_sel, upmask)


@jax.jit
def upsample_uniform_kernel(disps_sel):
    """8× zero-mask (uniform) upsampling — oracle path, no learned mask."""
    return upsample_disp_uniform(disps_sel)


@jax.jit
def normalize_kernel(poses, disps, count_mask):
    """Rescale disparities to unit mean and scale translations to match
    (depth_video.py:160-167). count_mask: (B,) 1.0 for active frames."""
    s = (jnp.sum(disps * count_mask[:, None, None])
         / jnp.clip(jnp.sum(count_mask) * disps.shape[1] * disps.shape[2], 1.0))
    disps = jnp.where(count_mask[:, None, None] > 0, disps / s, disps)
    poses = poses.at[:, :3].set(
        jnp.where(count_mask[:, None] > 0, poses[:, :3] * s, poses[:, :3]))
    return poses, disps


@partial(jax.jit, static_argnames=("fields", "down"), donate_argnums=(0,))
def _set_item_kernel(state: VideoState, idx, values, fields, down: int):
    """Fused keyframe write (see DepthVideo.set_item)."""
    def subsample_disp(full, target_shape):
        if full.shape == tuple(target_shape):
            # already 1/8-res DISPARITY (host-subsampled to keep the
            # upload small)
            return full
        off = down // 2 - 1
        d = full[off::down, off::down]
        d = d[: target_shape[0], : target_shape[1]]
        return jnp.where(d > 1e-6, 1.0 / jnp.clip(d, 1e-6), 0.0)

    upd = {}
    for name, v in zip(fields, values):
        cur = getattr(state, name)
        if name == "images":
            v = v.astype(jnp.uint8)
        elif name == "disps":
            v = jnp.broadcast_to(jnp.asarray(v, jnp.float32),
                                 cur.shape[1:])
        elif name in ("mono_disps", "gt_disps"):
            v = subsample_disp(v, cur.shape[1:])
        elif name == "fmaps":
            v = v.astype(jnp.bfloat16)
        else:
            v = v.astype(cur.dtype)
        upd[name] = cur.at[idx].set(v)
    return dataclasses.replace(state, **upd)


class DepthVideo:
    """Host facade over VideoState, mirroring the reference API."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.H = cfg["cam"]["H_out"]
        self.W = cfg["cam"]["W_out"]
        self.down = 8
        self.buffer = cfg["tracking"]["buffer"]
        self.BA_type = cfg["tracking"]["backend"]["BA_type"]
        self.mono_thres = cfg["tracking"]["mono_thres"]
        self.state = make_video_state(self.buffer, self.H, self.W, self.down)
        self.counter = 0
        self.dirty = np.zeros(self.buffer, bool)
        self.npc_dirty = np.zeros(self.buffer, bool)
        self._intr0 = None      # cached state.intrinsics[0] device row
        # achieved-FLOPs accounting (host-side analytic model, zero device
        # cost): producers add estimated flops here; bench.py divides the
        # totals by wall time for the achieved-TFLOP/s / MFU line
        self.flops_tracking = 0.0
        self.flops_mapping = 0.0
        # generation counter for poses/disps: bumped by every writer
        # (update rounds, BA, rm_keyframe, explicit set_item writes) so
        # the frontend's speculative edge-proposal prefetch can tell
        # whether the state it was computed from is still current
        self.pose_gen = 0

    @property
    def intr0(self):
        """Shared 1/8-res intrinsics row. Cached: `state.intrinsics[0]`
        is an eager slice dispatch, and it's read ~10x per keyframe."""
        if self._intr0 is None:
            self._intr0 = self.state.intrinsics[0]
        return self._intr0

    @property
    def ht(self):
        return self.H

    @property
    def wd(self):
        return self.W

    # -- item access ------------------------------------------------------

    def append(self, timestamp, image, pose, disp, mono_depth, intrinsics,
               fmap, net=None, inp=None, gt_pose=None, gt_depth=None):
        """Add a keyframe (depth_video.py:75-134 semantics)."""
        idx = self.counter
        self.set_item(idx, timestamp, image, pose, disp, mono_depth,
                      intrinsics, fmap, net, inp, gt_pose, gt_depth)
        self.counter = idx + 1

    def set_item(self, idx, timestamp, image, pose=None, disp=None,
                 mono_depth=None, intrinsics=None, fmap=None, net=None,
                 inp=None, gt_pose=None, gt_depth=None):
        """Write one keyframe's fields in a SINGLE device program: eagerly
        this was ~11 scatter dispatches per keyframe, each paying a
        compiler/loader RPC under the axon remote tunnel."""
        if pose is not None or disp is not None:
            self.pose_gen += 1
        if intrinsics is not None and int(idx) == 0:
            self._intr0 = None      # row 0 rewritten → drop the cache
        fields = ["timestamp"]
        values = [jnp.asarray(np.asarray(timestamp, np.float32))]
        for name, v in (("images", image), ("poses", pose), ("disps", disp),
                        ("mono_disps", mono_depth),
                        ("intrinsics", intrinsics), ("fmaps", fmap),
                        ("nets", net), ("inps", inp),
                        ("gt_poses", gt_pose), ("gt_disps", gt_depth)):
            if v is not None:
                # pre-cast 64-bit HOST inputs: jnp.asarray(float64) runs
                # an eager convert_element_type program per field
                if isinstance(v, np.ndarray):
                    if v.dtype == np.float64:
                        v = v.astype(np.float32)
                    elif v.dtype == np.int64:
                        v = v.astype(np.int32)
                values.append(jnp.asarray(v))
                fields.append(name)
        self.state = _set_item_kernel(self.state,
                                      jnp.asarray(np.asarray(idx, np.int32)),
                                      tuple(values), tuple(fields),
                                      self.down)
        if idx >= self.counter:
            self.counter = idx + 1

    # -- geometry ----------------------------------------------------------

    def reproject(self, ii, jj):
        ii_p, n = _pad_idx(np.asarray(ii))
        jj_p, _ = _pad_idx(np.asarray(jj))
        coords, valid = reproject_kernel(
            self.state.poses, self.state.disps, self.state.intrinsics,
            jnp.asarray(ii_p, jnp.int32), jnp.asarray(jj_p, jnp.int32))
        return coords[:n], valid[:n]

    def distance(self, ii=None, jj=None, beta=0.3, bidirectional=False):
        """Frame distance metric (depth_video.py:180-210).

        The bidirectional default matches the reference: edge proposal
        wants the DIRECTED d(i,j) (and one kernel launch); the
        frontend's keyframe-cull check passes bidirectional=True
        explicitly."""
        return_matrix = ii is None
        if return_matrix:
            N = self.counter
            if N == 0:
                return np.zeros((0, 0), np.float32)
            ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        ii_p, n = _pad_idx(np.asarray(ii))
        jj_p, _ = _pad_idx(np.asarray(jj))
        ii_j = jnp.asarray(np.asarray(ii_p, np.int32))
        jj_j = jnp.asarray(np.asarray(jj_p, np.int32))
        intr = self.intr0
        # achieved-FLOPs model: frame_distance reprojects every pixel of
        # each pair twice (pose-induced + translation-only flow,
        # droid_kernels.cu:518-659) ≈ 2×600 F per pair-pixel; the padded
        # pair count is what the kernel actually computes
        px = (self.H // self.down) * (self.W // self.down)
        self.flops_tracking += ((2 if bidirectional else 1)
                                * len(ii_p) * px * 1.2e3)
        if bidirectional:
            d1 = frame_distance_kernel(self.state.poses, self.state.disps,
                                       intr, ii_j, jj_j, beta)
            d2 = frame_distance_kernel(self.state.poses, self.state.disps,
                                       intr, jj_j, ii_j, beta)
            d = 0.5 * (d1 + d2)
        else:
            d = frame_distance_kernel(self.state.poses, self.state.disps,
                                      intr, ii_j, jj_j, beta)
        d = np.asarray(d)[:n]
        if return_matrix:
            N = self.counter
            return d.reshape(N, N)
        return d

    def distance_async(self, ii, jj, beta=0.3):
        """Dispatch the directed frame-distance kernel for (ii, jj) and
        start its device→host copy WITHOUT blocking. Returns (dev, n);
        resolve with np.asarray(dev)[:n].

        Used by the frontend's speculative edge-proposal prefetch: the
        pull lands on the host during the inter-keyframe tracking work
        instead of serializing the next keyframe's first device sync
        behind the whole queued pipeline (measured fe.edges 8.9 s /
        60-frame oracle bench = mostly queue-drain attribution)."""
        ii_p, n = _pad_idx(np.asarray(ii))
        jj_p, _ = _pad_idx(np.asarray(jj))
        d = frame_distance_kernel(
            self.state.poses, self.state.disps, self.intr0,
            jnp.asarray(np.asarray(ii_p, np.int32)),
            jnp.asarray(np.asarray(jj_p, np.int32)), beta)
        px = (self.H // self.down) * (self.W // self.down)
        self.flops_tracking += len(ii_p) * px * 1.2e3
        try:
            d.copy_to_host_async()
        except Exception:
            pass
        return d, n

    def get_nets(self, ii):
        """Bucketed gather of GRU hidden seeds for edges (host numpy)."""
        ii_p, n = _pad_idx(np.asarray(ii))
        sel = jnp.asarray(np.clip(ii_p, 0, self.buffer - 1), jnp.int32)
        return np.asarray(self.state.nets[sel])[:n]

    def upsample(self, ix, upmask):
        """upmask=None → uniform (zero-mask) upsampling (oracle path)."""
        ix_np = np.asarray(ix).reshape(-1)
        # pad to a shape bucket with an OOB sentinel (scatter drops it)
        ix_p, n = _pad_idx(ix_np, base=8, fill=self.buffer)
        ix_j = jnp.asarray(ix_p, jnp.int32)
        ix_safe = jnp.clip(ix_j, 0, self.buffer - 1)
        if upmask is None:
            up = upsample_uniform_kernel(self.state.disps[ix_safe])
        else:
            pad = len(ix_p) - n
            if pad:
                upmask = jnp.concatenate(
                    [upmask, jnp.zeros((pad,) + upmask.shape[1:],
                                       upmask.dtype)], 0)
            up = upsample_kernel(self.state.disps[ix_safe], upmask)
        self.state.disps_up = self.state.disps_up.at[ix_j].set(
            up, mode="drop")

    def normalize(self):
        mask = jnp.asarray(np.arange(self.buffer) < self.counter, jnp.float32)
        self.state.poses, self.state.disps = normalize_kernel(
            self.state.poses, self.state.disps, mask)
        self.set_dirty(0, self.counter)

    # -- BA dispatch (DSPO layer, depth_video.py:212-312) -------------------

    def ba(self, target, weight, eta, ii, jj, t0=1, t1=None, iters=2,
           lm=1e-4, ep=0.1, motion_only=False, opt_type="pose_depth"):
        if self.BA_type == "DSPO":
            ok = self.dspo(target, weight, eta, ii, jj, t0, t1, iters, lm,
                           ep, motion_only, opt_type)
            if not ok:
                self.dspo(target, weight, eta, ii, jj, t0, t1, iters, lm,
                          ep, motion_only, "pose_depth")
        elif self.BA_type == "DBA":
            self.dspo(target, weight, eta, ii, jj, t0, t1, iters, lm, ep,
                      motion_only, "pose_depth")
        else:
            raise NotImplementedError(self.BA_type)

    def dspo(self, target, weight, eta, ii, jj, t0=1, t1=None, iters=2,
             lm=1e-4, ep=0.1, motion_only=False, opt_type="pose_depth"):
        """DSPO layer: stage-1 pose+depth / stage-2 depth+scale+shift."""
        ii_np = np.asarray(ii).reshape(-1)
        jj_np = np.asarray(jj).reshape(-1)
        if t1 is None:
            t1 = int(max(ii_np.max(), jj_np.max())) + 1
        plan = ba_ops.make_edge_plan(ii_np, jj_np, int(t0), int(t1))
        s = self.state
        M = plan.M
        h, w = s.disps.shape[-2:]
        # per-depth-frame damping: eta rows follow kx (ba_cuda:1338-1346)
        eta_full = jnp.zeros((M, h, w), jnp.float32)
        kx = np.asarray(plan.kx)
        eta_rows = np.asarray(jnp.asarray(eta)) if eta is not None else None
        if eta_rows is not None:
            # caller supplies eta for unique(ii); map onto kx rows
            uniq = np.unique(ii_np)
            lut = {int(f): r for r, f in enumerate(uniq)}
            rows = np.asarray([lut.get(int(f), -1) for f in kx])
            sel = rows >= 0
            eta_full = eta_full.at[jnp.asarray(np.where(sel)[0])].set(
                jnp.asarray(eta_rows[rows[sel]]))

        if opt_type == "pose_depth":
            sens = jnp.zeros_like(s.disps)  # reference passes zeros
            s.poses, s.disps = ba_ops.dba(
                s.poses, s.disps, self.intr0, target, weight, eta_full,
                sens, plan, iters=iters, lm=lm, ep=ep,
                motion_only=motion_only)
            return True

        if opt_type == "depth_scale":
            self.update_valid_depth_mask(up=False)
            curr = self.counter
            # bucketed slice: an unbucketed [:curr] recompiles per keyframe
            nb = min(ba_ops._geom_bucket(max(curr, 1), 16), self.buffer)
            mono = s.mono_disps[:nb]
            est = s.disps[:nb]
            valid = s.valid_depth_mask_small[:nb]
            scale_t, shift_t, err_t = ba_ops.align_scale_and_shift(
                mono, est, valid)
            live = jnp.arange(nb) < curr
            s.depth_scale = s.depth_scale.at[:nb].set(
                jnp.where(live, scale_t, s.depth_scale[:nb]))
            s.depth_shift = s.depth_shift.at[:nb].set(
                jnp.where(live, shift_t, s.depth_shift[:nb]))
            ii_t, jj_t, target_t, weight_t = ii_np, jj_np, target, weight
            if self.mono_thres:
                # drop edges touching frames with bad mono depth
                # (depth_video.py:256-276); shared device helper (ONE
                # fetch) — the fused tracking kernel applies the same
                # rule as a per-edge weight mask (factor_graph)
                bad = np.asarray(ba_ops.bad_mono_from_fit(
                    scale_t, err_t, est, valid,
                    float(self.mono_thres)))[:curr]
                bad_frames = set(np.where(bad)[0].tolist())
                keep = np.asarray([
                    (int(a) not in bad_frames) and (int(b) not in bad_frames)
                    for a, b in zip(ii_np, jj_np)])
                if keep.sum() == 0:
                    return False
                ii_t = ii_np[keep]
                jj_t = jj_np[keep]
                target_t = target[jnp.asarray(np.where(keep)[0])]
                weight_t = weight[jnp.asarray(np.where(keep)[0])]

            if curr <= 0 or len(ii_t) == 0:
                return False
            plan2 = ba_ops.make_edge_plan(ii_t, jj_t, int(t0), int(t1))
            eta2 = jnp.zeros((plan2.M, h, w), jnp.float32)
            if eta_rows is not None:
                uniq_all = np.unique(ii_np)
                lut = {int(f): r for r, f in enumerate(uniq_all)}
                kx2 = np.asarray(plan2.kx)
                rows = np.asarray([lut.get(int(f), -1) for f in kx2])
                sel = rows >= 0
                eta2 = eta2.at[jnp.asarray(np.where(sel)[0])].set(
                    jnp.asarray(eta_rows[rows[sel]]))
            s.disps, s.depth_scale, s.depth_shift = ba_ops.ba_scale_shift(
                s.poses, s.disps, self.intr0, target_t, weight_t, eta2,
                s.mono_disps, s.depth_scale, s.depth_shift,
                s.valid_depth_mask_small, plan2, iters=iters, lm=lm, ep=ep,
                alpha=0.01)
            return True

        raise NotImplementedError(opt_type)

    # -- multiview filter (depth_video.py:340-375) --------------------------

    def update_valid_depth_mask(self, up=True):
        if up:
            dirty_index = np.where(self.dirty)[0]
            if len(dirty_index) == 0:
                return
        else:
            dirty_index = np.arange(self.counter)
        if len(dirty_index) == 0:
            return
        s = self.state
        idx_p, n = _pad_idx(dirty_index, base=8, fill=self.buffer)
        idx_j = jnp.asarray(np.asarray(idx_p, np.int32))
        mv = self.cfg["tracking"]["multiview_filter"]
        # ONE program (was ~12 eager dispatches per call)
        new_mask = _valid_mask_kernel(
            s.poses, s.disps_up if up else s.disps,
            s.valid_depth_mask if up else s.valid_depth_mask_small,
            self.intr0, idx_j,
            thresh_mult=float(mv["thresh"]),
            visible_num=int(mv["visible_num"]),
            intr_scale=float(self.down if up else 1.0))
        if up:
            s.valid_depth_mask = new_mask
            self.dirty[dirty_index] = False
        else:
            s.valid_depth_mask_small = new_mask

    def set_dirty(self, start, end):
        self.dirty[start:end] = True
        self.npc_dirty[start:end] = True

    # -- export (depth_video.py:327-398) ------------------------------------

    def get_pose(self, index):
        """c2w 4x4 matrix for keyframe index."""
        # 7-vec pull + host conversion: no device matrix program
        return lie.inv_matrix_np(np.asarray(self.state.poses[index]))[0]

    def get_depth_and_pose(self, index):
        est_disp = self.state.disps_up[index]
        est_depth = np.asarray(1.0 / jnp.clip(est_disp, 1e-8))
        mask = np.asarray(self.state.valid_depth_mask[index])
        return est_depth, mask, self.get_pose(index)

    def save_video(self, path: str):
        n = self.counter
        # batched device→host pulls (one per array, not per keyframe),
        # sliced at a geometric bucket so the device programs compile for
        # O(log buffer) distinct shapes, not one per run length (an
        # unbucketed [:n] slice = a fresh ~13 s remote compile per run)
        nb = min(ba_ops._geom_bucket(max(n, 1), 16), self.buffer)
        # f16 disparity transfer (bulk is ~70 ms/MB on the tunneled
        # link; half the bytes of the former f32 depth pull) — depth
        # reciprocal + pose matrices are host math. f16 rel. error
        # ~5e-4 is far below the depth-eval noise floor.
        disps = np.asarray(
            self.state.disps_up[:nb].astype(jnp.float16))[:n]
        masks = np.asarray(self.state.valid_depth_mask[:nb])[:n]
        poses7 = np.asarray(self.state.poses[:nb])[:n]
        stamps = np.asarray(self.state.timestamp[:nb])[:n]
        depths = 1.0 / np.clip(disps.astype(np.float32), 1e-8, None)
        poses = lie.inv_matrix_np(poses7) if n else \
            np.zeros((0, 4, 4), np.float32)
        np.savez(path, poses=poses, depths=depths, timestamps=stamps,
                 valid_depth_masks=masks)

    def get_depth_scale_and_shift(self, index, mono_depth, est_depth, weights):
        scale, shift, _ = ba_ops.align_scale_and_shift(
            mono_depth[None], est_depth[None], weights[None])
        self.state.depth_scale = self.state.depth_scale.at[index].set(scale[0])
        self.state.depth_shift = self.state.depth_shift.at[index].set(shift[0])
        return [float(scale[0]), float(shift[0])]

    def eval_depth_l1(self, npz_path, stream, global_scale=None):
        """Proxy-depth L1 vs GT (depth_video.py:401-448)."""
        data = np.load(npz_path)
        stamps = data["timestamps"]
        n = stamps.shape[0]
        # batched device→host pulls (one per array, not six per keyframe);
        # bucketed slice length → no per-run-length recompiles
        nb = min(ba_ops._geom_bucket(max(n, 1), 16), self.buffer)
        masks_all = np.asarray(self.state.valid_depth_mask[:nb])[:n]
        disps_all = np.asarray(
            self.state.disps_up[:nb].astype(jnp.float16))[:n].astype(
            np.float32)

        def _align_np(pred, target, w):
            """Closed-form weighted LSQ on the host (align_scale_and_shift
            parity; tiny problem, no device round trip)."""
            a00 = (w * pred * pred).sum()
            a01 = (w * pred).sum()
            a11 = w.sum()
            b0 = (w * pred * target).sum()
            b1 = (w * target).sum()
            det = a00 * a11 - a01 * a01
            if abs(det) < 1e-12:
                return 1.0, 0.0
            return ((a11 * b0 - a01 * b1) / det,
                    (-a01 * b0 + a00 * b1) / det)

        l1_list, l1_4m, cover = [], [], []
        for i in range(n):
            ts = int(stamps[i])
            mask = masks_all[i]
            cover.append(mask.mean())
            depth = 1.0 / np.clip(disps_all[i], 1e-8, None)
            depth[~mask] = 0
            depth_gt = np.asarray(stream[ts][2])
            m = (depth_gt > 0) & mask
            for (out, extra_mask) in ((l1_list, None), (l1_4m, depth_gt < 4)):
                mm = m if extra_mask is None else (m & extra_mask)
                if mm.sum() == 0:
                    out.append(np.nan)
                    continue
                d = depth.copy()
                d[~mm] = 0
                if global_scale is None:
                    sc, sh = _align_np(d, depth_gt, mm.astype(np.float32))
                    d = sc * d + sh
                else:
                    d = global_scale * d
                out.append(np.abs(d[mm] - depth_gt[mm]).mean())
        return (float(np.nanmean(l1_list)), float(np.nanmean(l1_4m)),
                float(np.mean(cover)))
