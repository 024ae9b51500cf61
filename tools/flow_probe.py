#!/usr/bin/env python
"""Measure a tracker checkpoint's iterated flow EPE on the bench scene.

The probe renders smoke-geometry frame pairs (240x320, fx 200,
motion_scale 5 — the exact workload `bench.py` tracks) at several frame
gaps and several positions along the trajectory, runs 8 update-operator
iterations (the motion_filter/track loop pattern,
tracking/motion_filter.py track_kernel), and reports:

  gap G: gt_flow <mean GT flow px>  epe <mean endpoint error px>
         first_delta <mean |delta| of iteration 1>

Interpretation: epe << gt_flow means the net genuinely tracks; epe ~=
gt_flow means it predicts near-zero motion (blind); first_delta is what
the keyframe-admission threshold (motion_filter.thresh) compares
against. This caught two shipped-checkpoint failures: training pairs
pinned to frames (0,1) of the procedural trajectory (constant motion
direction -> memorized prior), and bucket config never reaching the
240x320 geometry.

Usage: python tools/flow_probe.py [ckpt.msgpack]
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from splatslam_tpu.models.droid_net import DroidNet, normalize_images
from splatslam_tpu.ops import corr as corr_ops
from splatslam_tpu.ops import projective as pops
from splatslam_tpu.ops import lie
from splatslam_tpu.datasets import Synthetic
from splatslam_tpu.train.droid_trainer import load_selftrained


def main(ckpt="pretrained/droid_dba.msgpack"):
    cfg = {
        "dataset": "synthetic",
        "cam": {"H": 240, "W": 320, "fx": 200.0, "fy": 200.0, "cx": 159.5,
                "cy": 119.5, "H_out": 240, "W_out": 320, "H_edge": 0,
                "W_edge": 0},
        "synthetic": {"n_frames": 60, "seed": 7, "motion_scale": 5.0},
    }
    ds = Synthetic(cfg)
    params = load_selftrained(ckpt)
    model = DroidNet()
    h, w = 30, 40
    coords0 = pops.coords_grid(h, w)

    @jax.jit
    def epe_pair(img1, img2, disp8, pose1, pose2, intr8):
        x = normalize_images(jnp.stack([img1, img2]))
        fmaps = model.apply({"params": params}, x, method=DroidNet.features)
        cn, ci = model.apply({"params": params},
                             normalize_images(img1[None]),
                             method=DroidNet.context)
        pyr = corr_ops.build_corr_pyramid(fmaps[:1].astype(jnp.float32),
                                          fmaps[1:].astype(jnp.float32))
        poses = jnp.stack([pose1, pose2])
        ii = jnp.asarray([0], jnp.int32)
        jj = jnp.asarray([1], jnp.int32)
        gt, valid = pops.projective_transform(
            poses[None], disp8[None][None].repeat(2, 1),
            intr8[None][None].repeat(2, 1), ii, jj)
        gt = gt[0, 0]
        valid = valid[0, 0][..., 0]
        net = cn
        coords = jnp.broadcast_to(coords0, (1, h, w, 2))
        first_delta = None
        for _ in range(8):
            corr = corr_ops.lookup_pyramid(pyr, coords)
            motn = jnp.concatenate(
                [jnp.clip(coords - coords0, -64, 64),
                 jnp.zeros_like(coords)], -1)
            net, delta, _wgt = model.apply(
                {"params": params}, net, ci, corr, motn,
                method=DroidNet.update_step)
            if first_delta is None:
                first_delta = jnp.linalg.norm(
                    delta.astype(jnp.float32), axis=-1).mean()
            coords = coords + delta.astype(jnp.float32)
        err = jnp.linalg.norm(coords[0] - gt, axis=-1) * valid
        gtmag = jnp.linalg.norm(gt - coords0, axis=-1) * valid
        estmag = jnp.linalg.norm(coords[0] - coords0, axis=-1) * valid
        # SIGNED magnitude bias: negative = the net systematically
        # underestimates flow. A short-flow bias inflates DBA depths a
        # little on every keyframe -> compounding monocular scale drift
        # (measured: median disparity shrinking ~8%/keyframe).
        bias = (estmag - gtmag).sum() / jnp.clip(valid.sum(), 1)
        return (err.sum() / jnp.clip(valid.sum(), 1),
                gtmag.sum() / jnp.clip(valid.sum(), 1), first_delta, bias)

    off = 3
    intr8 = jnp.asarray([200.0 / 8, 200.0 / 8, 159.5 / 8, 119.5 / 8])
    for gap in (1, 2, 3, 5, 8):
        es, gs, fs, bs = [], [], [], []
        for k0 in (5, 15, 25, 40):
            _, im1, d1, c1 = ds[k0]
            _, im2, _, c2 = ds[k0 + gap]
            d8 = d1[off::8, off::8][:h, :w]
            disp8 = np.where(d8 > 1e-6, 1.0 / np.maximum(d8, 1e-6), 0.0)
            p1 = lie.from_matrix(jnp.asarray(np.linalg.inv(c1)))
            p2 = lie.from_matrix(jnp.asarray(np.linalg.inv(c2)))
            e, g, fd, b = epe_pair(jnp.asarray(im1), jnp.asarray(im2),
                                   jnp.asarray(disp8), p1, p2, intr8)
            es.append(float(e)); gs.append(float(g))
            fs.append(float(fd)); bs.append(float(b))
        print(f"gap {gap}: gt_flow {np.mean(gs):6.2f} px  "
              f"epe {np.mean(es):6.3f} px  "
              f"first_delta {np.mean(fs):5.2f} px  "
              f"mag_bias {np.mean(bs):+6.3f} px", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
