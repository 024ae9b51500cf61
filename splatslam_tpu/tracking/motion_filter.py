"""Motion filter: keyframe gating by mean optical-flow magnitude.

Reference: thirdparty/glorie_slam/motion_filter.py:23-105. Per frame:
encode features, correlate against the last keyframe, run one GRU
iteration, and admit the frame as a keyframe if the mean flow revision
exceeds the threshold. The whole check is one jitted kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.droid_net import DroidNet, normalize_images, compute_dtype
from ..ops import corr as corr_ops
from ..ops import projective as pops
from ..ops import lie


@jax.jit
def encode_features(params, image):
    """image (H,W,3) float [0,1] → fmap (h,w,128)."""
    net = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(image)[None]
    return net.apply({"params": params}, inputs,
                     method=DroidNet.features)[0]


@jax.jit
def encode_context(params, image):
    net = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(image)[None]
    cn, ci = net.apply({"params": params}, inputs, method=DroidNet.context)
    return cn[0].astype(jnp.float32), ci[0].astype(jnp.float32)


@jax.jit
def track_kernel(params, image, fmap_last, net_last, inp_last):
    """Fused per-frame motion check: encode features AND compute the mean
    flow-revision magnitude vs the last keyframe in one dispatch
    (motion_filter.py:73-94 runs these as separate launches)."""
    model = DroidNet(dtype=compute_dtype())
    inputs = normalize_images(image)[None]
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

    def _oracle_flow(self, gt_pose, gt_depth, intr8):
        """Mean GT-induced flow vs the last keyframe (oracle admission)."""
        from .depth_video import frame_distance_kernel
        off = self.video.down // 2 - 1
        h = self.video.H // self.video.down
        w = self.video.W // self.video.down
        gd = jnp.asarray(gt_depth)[off::self.video.down,
                                   off::self.video.down][:h, :w]
        disp = jnp.where(gd > 1e-6, 1.0 / jnp.clip(gd, 1e-6), 0.0)
        last_pose, last_disp = self._last_gt
        poses = jnp.stack([last_pose, jnp.asarray(gt_pose)])
        disps = jnp.stack([last_disp, disp])
        d = frame_distance_kernel(poses, disps, intr8,
                                  jnp.asarray([0]), jnp.asarray([1]), 1.0)
        return float(d[0]), disp

    def track(self, tstamp, image, intrinsics, gt_pose=None, gt_depth=None):
        """image (H,W,3) float [0,1]; intrinsics (4,) full-res;
        gt_pose (7,) w2c + gt_depth (H,W) feed the oracle/eval slots."""
        intr8 = jnp.asarray(intrinsics) / float(self.video.down)
        if self.video.counter == 0 or self.oracle:
            gmap = encode_features(self.params, image)
            delta_mag = None
        else:
            gmap, delta_mag = track_kernel(self.params, image, self.fmap,
                                           self.net, self.inp)

        if self.video.counter == 0:
            net, inp = encode_context(self.params, image)
            self.fmap, self.net, self.inp = gmap, net, inp
            mono = self.mono_fn(tstamp, image) if self.mono_fn else None
            self.video.append(
                tstamp, image * 255.0, lie.identity(), 1.0, mono, intr8,
                gmap, net, inp, gt_pose=gt_pose, gt_depth=gt_depth)
            if self.oracle and gt_pose is not None:
                off = self.video.down // 2 - 1
                h = self.video.H // self.video.down
                w = self.video.W // self.video.down
                gd = jnp.asarray(gt_depth)[off::self.video.down,
                                           off::self.video.down][:h, :w]
                self._last_gt = (jnp.asarray(gt_pose),
                                 jnp.where(gd > 1e-6,
                                           1.0 / jnp.clip(gd, 1e-6), 0.0))
            return True

        if self.oracle and gt_pose is not None and self._last_gt is not None:
            delta, disp = self._oracle_flow(gt_pose, gt_depth, intr8)
        else:
            delta = float(delta_mag)
            disp = None
        if delta > self.thresh:
            self.count = 0
            net, inp = encode_context(self.params, image)
            self.fmap, self.net, self.inp = gmap, net, inp
            mono = self.mono_fn(tstamp, image) if self.mono_fn else None
            self.video.append(
                tstamp, image * 255.0, None, None, mono, intr8,
                gmap, net, inp, gt_pose=gt_pose, gt_depth=gt_depth)
            if self.oracle and gt_pose is not None:
                self._last_gt = (jnp.asarray(gt_pose), disp)
            return True
        self.count += 1
        return False
