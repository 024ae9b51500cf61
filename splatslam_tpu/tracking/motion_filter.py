"""Motion filter: keyframe gating by mean optical-flow magnitude.

Reference: thirdparty/glorie_slam/motion_filter.py:23-105. Per frame:
encode features, correlate against the last keyframe, run one GRU
iteration, and admit the frame as a keyframe if the mean flow revision
exceeds the threshold. The whole check is one jitted kernel.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.droid_net import DroidNet, normalize_images, compute_dtype
from ..ops import corr as corr_ops
from ..ops import projective as pops
from ..ops import lie


def _disp8_np(depth, down, h, w):
    """Host-side 1/8 subsample of a full-res depth map → disparity.
    Keeps the per-frame host→device upload at ~5 KB instead of ~300 KB
    (the tunnel link is the bottleneck, not compute)."""
    off = down // 2 - 1
    d = np.asarray(depth)[off::down, off::down][:h, :w]
    return np.where(d > 1e-6, 1.0 / np.maximum(d, 1e-6), 0.0).astype(
        np.float32)


def _img255(image):
    """Storage form for VideoState.images (uint8 0-255)."""
    if image.dtype == jnp.uint8:
        return image
    return image * 255.0


def _to_float(image):
    """Accept uint8 (the cheap host→device upload format — the axon
    tunnel moves ~10-50 MB/s) or float [0,1]."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    return image


@jax.jit
def encode_features(params, image):
    """image (H,W,3) float [0,1] or uint8 → fmap (h,w,128)."""
    net = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(_to_float(image))[None]
    return net.apply({"params": params}, inputs,
                     method=DroidNet.features)[0]


@jax.jit
def encode_features_batch(params, images):
    """images (B,H,W,3) → fmaps (B,h,w,128): ONE conv-encoder program for
    a whole frame batch (the TrajectoryFiller encodes 16 frames at a
    time — per-frame dispatches left the MXU idle between launches)."""
    net = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(_to_float(images))
    return net.apply({"params": params}, inputs, method=DroidNet.features)


@jax.jit
def encode_context(params, image):
    net = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(_to_float(image))[None]
    cn, ci = net.apply({"params": params}, inputs, method=DroidNet.context)
    return cn[0].astype(jnp.float32), ci[0].astype(jnp.float32)


@jax.jit
def track_kernel(params, image, fmap_last, net_last, inp_last):
    """Fused per-frame motion check: encode features AND compute the mean
    flow-revision magnitude vs the last keyframe in one dispatch
    (motion_filter.py:73-94 runs these as separate launches)."""
    model = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(_to_float(image))[None]
    gmap = model.apply({"params": params}, inputs,
                       method=DroidNet.features)[0]
    h, w = gmap.shape[:2]
    coords0 = pops.coords_grid(h, w)[None]
    pyr = corr_ops.build_corr_pyramid(fmap_last[None],
                                      gmap[None].astype(fmap_last.dtype))
    corr = corr_ops.lookup_pyramid(pyr, coords0)
    _, delta, _ = model.apply(
        {"params": params}, net_last[None], inp_last[None], corr,
        method=DroidNet.update_step)
    return gmap, jnp.linalg.norm(
        delta.astype(jnp.float32), axis=-1).mean()


@jax.jit
def admission_scan(params, images_u8, fmap0, net0, inp0, thresh):
    """Chunked keyframe-admission: run the per-frame motion check for a
    whole chunk of frames in ONE device program.

    The admission chain is sequential (each frame correlates against the
    last ADMITTED frame's features) but depends only on the motion
    filter's own state — never on the frontend/BA state — so it can run
    ahead of keyframe processing as a lax.scan whose carry is
    (fmap, ctx_net, ctx_inp) of the last admitted frame. Replaces
    one dispatch + one scalar fetch PER FRAME (2 link round trips over
    the TPU tunnel — ~160 ms/frame at degraded RTT, the single largest
    learned-mode phase in BENCH_r04) with one upload + one small fetch
    per chunk.

    Returns (pack, gmaps, nets, inps): pack = [admit_flags | deltas]
    (2C,) f32 — the ONLY array the host needs to pull; the per-frame
    feature/context maps stay on device and are sliced on admission.

    Context features are computed for every frame (the per-frame path
    encodes them only for admitted frames): ~2x encoder FLOPs for
    admitted-rate < 1, which is MXU time measured in microseconds —
    irrelevant next to the link round trips it removes.

    Reference: thirdparty/glorie_slam/motion_filter.py:61-105 (same
    decision rule, fused + batched).
    """
    model = DroidNet(dtype=compute_dtype())
    h, w = fmap0.shape[:2]
    coords0 = pops.coords_grid(h, w)[None]

    def step(carry, image):
        fmap, net_c, inp_c = carry
        inputs = normalize_images(_to_float(image))[None]
        gmap = model.apply({"params": params}, inputs,
                           method=DroidNet.features)[0]
        cn, ci = model.apply({"params": params}, inputs,
                             method=DroidNet.context)
        cn = cn[0].astype(jnp.float32)
        ci = ci[0].astype(jnp.float32)
        pyr = corr_ops.build_corr_pyramid(fmap[None],
                                          gmap[None].astype(fmap.dtype))
        corr = corr_ops.lookup_pyramid(pyr, coords0)
        _, delta, _ = model.apply(
            {"params": params}, net_c[None], inp_c[None], corr,
            method=DroidNet.update_step)
        dmag = jnp.linalg.norm(delta.astype(jnp.float32), axis=-1).mean()
        admit = dmag > thresh
        carry = (jnp.where(admit, gmap, fmap),
                 jnp.where(admit, cn, net_c),
                 jnp.where(admit, ci, inp_c))
        return carry, (admit, dmag, gmap, cn, ci)

    _, (admits, dmags, gmaps, nets, inps) = jax.lax.scan(
        step, (fmap0, net0, inp0), images_u8)
    pack = jnp.concatenate([admits.astype(jnp.float32), dmags])
    return pack, gmaps, nets, inps


@jax.jit
def flow_magnitude(params, fmap_last, gmap, net_last, inp_last):
    """One update-operator iteration vs the last keyframe; returns the
    mean ‖delta‖ (motion_filter.py:85-94)."""
    model = DroidNet(dtype=compute_dtype())
    h, w = fmap_last.shape[:2]
    coords0 = pops.coords_grid(h, w)[None]
    pyr = corr_ops.build_corr_pyramid(fmap_last[None],
                                      gmap[None].astype(fmap_last.dtype))
    corr = corr_ops.lookup_pyramid(pyr, coords0)
    _, delta, _ = model.apply(
        {"params": params}, net_last[None], inp_last[None], corr,
        method=DroidNet.update_step)
    return jnp.linalg.norm(delta.astype(jnp.float32), axis=-1).mean()


class MotionFilter:
    def __init__(self, params, video, cfg, mono_fn=None):
        self.params = params
        self.video = video
        self.thresh = cfg["tracking"]["motion_filter"]["thresh"]
        self.oracle = cfg["tracking"].get("oracle", False)
        self.mono_fn = mono_fn      # (tstamp, image) -> full-res depth or None
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None
        self._last_gt = None        # (pose7, disp) of last keyframe
        from ..utils.profiling import PhaseTimers
        self.timers = PhaseTimers()  # replaced by SLAM's shared timers

    def _oracle_flow(self, gt_pose, gt_disp8, intr8):
        """Mean GT-induced flow vs the last keyframe (oracle admission).

        Pure numpy on the host: the inputs are tiny (two 7-vec poses +
        a 1/8-res disparity) and a device dispatch + scalar fetch costs
        ~2 link round trips (~60-100 ms) per frame — more than the whole
        tracking compute. Mirrors frame_distance_kernel (β = 1)."""
        from .depth_video import CUDA_MIN_DEPTH
        last_pose, last_disp = self._last_gt
        last_pose = np.asarray(last_pose)
        d_i = np.asarray(last_disp)
        h, w = d_i.shape
        fx, fy, cx, cy = [float(x) for x in np.asarray(intr8)]

        def mat(p):
            t, q = p[:3], p[3:7]   # xyzw
            x, y, z, qw = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - qw * z),
                 2 * (x * z + qw * y)],
                [2 * (x * y + qw * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - qw * x)],
                [2 * (x * z - qw * y), 2 * (y * z + qw * x),
                 1 - 2 * (x * x + y * y)]])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            return T

        Gij = mat(np.asarray(gt_pose)) @ np.linalg.inv(mat(last_pose))
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        X = (xs - cx) / fx
        Y = (ys - cy) / fy
        # homogeneous points (X, Y, 1, d) — SE3 action as in lie.act
        Pj = (np.stack([X, Y, np.ones_like(X)], -1) @ Gij[:3, :3].T
              + d_i[..., None] * Gij[:3, 3])
        u = fx * Pj[..., 0] / Pj[..., 2] + cx
        v = fy * Pj[..., 1] / Pj[..., 2] + cy
        dist = np.sqrt((u - xs) ** 2 + (v - ys) ** 2)
        valid = Pj[..., 2] > CUDA_MIN_DEPTH
        frac = valid.mean()
        d = 1000.0 if frac < 0.75 else \
            float((dist * valid).sum() / max(valid.sum(), 1e-8))
        return d, gt_disp8

    def decide_batch(self, images_u8_dev, n):
        """Run the admission scan for a chunk of `n` frames (the device
        batch may be padded beyond n — pad decisions are discarded).
        Returns (admits[n] bool, deltas[n], gmaps, nets, inps) where the
        feature arrays are device-resident (C,...) to be sliced by
        commit_batch_frame. ONE small host pull for the whole chunk."""
        C = int(images_u8_dev.shape[0])
        h8 = self.video.H // self.video.down
        w8 = self.video.W // self.video.down
        pack, gmaps, nets, inps = admission_scan(
            self.params, images_u8_dev, self.fmap, self.net, self.inp,
            jnp.float32(self.thresh))
        enc_f = float(self.video.H * self.video.W) * 8e3
        self.video.flops_tracking += C * (2 * enc_f + h8 * w8 * 2.8e6)
        small = np.asarray(pack)        # the chunk's single device pull
        admits = small[:C] > 0.5
        deltas = small[C:2 * C]
        return admits[:n], deltas[:n], gmaps, nets, inps

    def commit_batch_frame(self, k, batch, tstamp, images_u8_dev,
                           intrinsics, gt_pose=None, gt_depth=None):
        """Admit frame k of a decide_batch chunk: update the last-keyframe
        feature state to the scan's row k and append to the video —
        identical bookkeeping to the admitted branch of track()."""
        admits, deltas, gmaps, nets, inps = batch
        h8 = self.video.H // self.video.down
        w8 = self.video.W // self.video.down
        intr8 = np.asarray(intrinsics, np.float32) / float(self.video.down)
        gt_disp8 = (_disp8_np(gt_depth, self.video.down, h8, w8)
                    if gt_depth is not None else None)
        self.count = 0
        self.fmap = gmaps[k]
        self.net, self.inp = nets[k], inps[k]
        image = images_u8_dev[k]
        T = self.timers
        with T("mf.mono"):
            mono = self.mono_fn(tstamp, image) if self.mono_fn else None
        if mono is not None:
            mono = _disp8_np(mono, self.video.down, h8, w8)
        with T("mf.append"):
            self.video.append(
                tstamp, _img255(image), None, None, mono, intr8,
                self.fmap, self.net, self.inp, gt_pose=gt_pose,
                gt_depth=gt_disp8)

    def track(self, tstamp, image, intrinsics, gt_pose=None, gt_depth=None):
        """image (H,W,3) float [0,1]; intrinsics (4,) full-res;
        gt_pose (7,) w2c + gt_depth (H,W) feed the oracle/eval slots."""
        T = self.timers
        # host numpy: consumed by host logic (oracle flow) every frame and
        # uploaded only on keyframe admission (video.append)
        intr8 = np.asarray(intrinsics, np.float32) / float(self.video.down)
        h8 = self.video.H // self.video.down
        w8 = self.video.W // self.video.down
        gt_disp8 = (_disp8_np(gt_depth, self.video.down, h8, w8)
                    if gt_depth is not None else None)
        oracle_gated = (self.oracle and self.video.counter > 0
                        and gt_pose is not None
                        and self._last_gt is not None)
        gmap = None
        delta_mag = None
        # achieved-FLOPs model (bench MFU): fnet/cnet ≈ 8 kF per input
        # pixel each (3-stage residual encoder, RAFT class); one GRU+corr
        # update iteration ≈ 2.8 MF per 1/8-res pixel (the
        # factor_graph.update_rounds constant)
        enc_f = float(self.video.H * self.video.W) * 8e3
        if self.video.counter == 0 or (self.oracle and not oracle_gated):
            with T("mf.encode_f"):
                gmap = encode_features(self.params, image)
                self.video.flops_tracking += enc_f
        elif not self.oracle:
            with T("mf.track_kernel"):
                gmap, delta_mag = track_kernel(self.params, image, self.fmap,
                                               self.net, self.inp)
                self.video.flops_tracking += enc_f + h8 * w8 * 2.8e6
        # oracle_gated: admission needs only GT flow (a ~5 KB upload);
        # features are encoded lazily below, only for admitted keyframes

        if self.video.counter == 0:
            net, inp = encode_context(self.params, image)
            self.fmap, self.net, self.inp = gmap, net, inp
            with T("mf.mono"):
                mono = (self.mono_fn(tstamp, image)
                        if self.mono_fn else None)
            if mono is not None:
                mono = _disp8_np(mono, self.video.down, h8, w8)
            self.video.append(
                tstamp, _img255(image), lie.identity(), 1.0, mono, intr8,
                gmap, net, inp, gt_pose=gt_pose, gt_depth=gt_disp8)
            if self.oracle and gt_pose is not None:
                d0 = gt_disp8 if gt_disp8 is not None else \
                    np.ones((h8, w8), np.float32)
                self._last_gt = (np.asarray(gt_pose), d0)
            return True

        if self.oracle and gt_pose is not None and self._last_gt is not None:
            with T("mf.oracle_flow"):
                delta, disp = self._oracle_flow(gt_pose, gt_disp8, intr8)
        elif delta_mag is not None:
            delta = float(delta_mag)
            disp = None
        else:
            # oracle mode with no GT signal for this frame (missing
            # gt_pose, or the previous keyframe had none): no flow
            # estimate exists — admit the frame rather than crash, the
            # conservative choice (extra keyframes cost time, skipped
            # ones lose track)
            delta = float("inf")
            disp = None
        if delta > self.thresh:
            self.count = 0
            if gmap is None:
                with T("mf.encode_f"):
                    gmap = encode_features(self.params, image)
                    self.video.flops_tracking += enc_f
            with T("mf.encode_c"):
                net, inp = encode_context(self.params, image)
                self.video.flops_tracking += enc_f
            self.fmap, self.net, self.inp = gmap, net, inp
            with T("mf.mono"):
                mono = (self.mono_fn(tstamp, image)
                        if self.mono_fn else None)
            if mono is not None:
                mono = _disp8_np(mono, self.video.down, h8, w8)
            with T("mf.append"):
                self.video.append(
                    tstamp, _img255(image), None, None, mono, intr8,
                    gmap, net, inp, gt_pose=gt_pose, gt_depth=gt_disp8)
            if self.oracle and gt_pose is not None:
                d1 = disp if disp is not None else \
                    np.ones((h8, w8), np.float32)
                self._last_gt = (np.asarray(gt_pose), d1)
            return True
        self.count += 1
        return False
