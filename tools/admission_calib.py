#!/usr/bin/env python
"""Simulate keyframe admission density per motion_filter.thresh.

Runs the real track_kernel (one GRU iteration vs the last admitted
keyframe, tracking/motion_filter.py) over the bench scene for a sweep of
thresholds and reports admitted/total. Used to re-derive
`motion_filter.thresh` for a new tracker checkpoint: first_delta's scale
is checkpoint-dependent (docs/TPU_PERF_NOTES.md), so the threshold that
matches oracle admission density (~27/60 at thresh 1.0 GT px on this
scene) must be re-measured whenever pretrained/*.msgpack changes.

Usage: python tools/admission_calib.py [ckpt.msgpack] [thresh ...]
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from splatslam_tpu.models.droid_net import DroidNet  # noqa: F401 (weights fmt)
from splatslam_tpu.datasets import Synthetic
from splatslam_tpu.train.droid_trainer import load_selftrained
from splatslam_tpu.tracking.motion_filter import (
    encode_features, encode_context, track_kernel)


def main(ckpt="pretrained/droid_dba.msgpack", threshes=(1.2, 1.4, 1.6, 1.8)):
    cfg = {
        "dataset": "synthetic",
        "cam": {"H": 240, "W": 320, "fx": 200.0, "fy": 200.0, "cx": 159.5,
                "cy": 119.5, "H_out": 240, "W_out": 320, "H_edge": 0,
                "W_edge": 0},
        "synthetic": {"n_frames": 60, "seed": 7, "motion_scale": 5.0},
    }
    ds = Synthetic(cfg)
    params = load_selftrained(ckpt)
    frames = []
    for i in range(len(ds)):
        _, color, _, _ = ds[i]
        frames.append(jnp.asarray(np.asarray(color)))
    for thresh in threshes:
        fmap = encode_features(params, frames[0])
        net, inp = encode_context(params, frames[0])
        admitted = [0]
        deltas = []
        for i in range(1, len(frames)):
            gmap, dmag = track_kernel(params, frames[i], fmap, net, inp)
            d = float(dmag)
            deltas.append(d)
            if d > thresh:
                admitted.append(i)
                fmap = gmap
                net, inp = encode_context(params, frames[i])
        gaps = np.diff(admitted)
        print(f"thresh {thresh:4.2f}: admitted {len(admitted)}/60  "
              f"median_gap {np.median(gaps) if len(gaps) else 0:.1f}  "
              f"delta p10/p50/p90 {np.percentile(deltas, 10):.2f}/"
              f"{np.percentile(deltas, 50):.2f}/"
              f"{np.percentile(deltas, 90):.2f}")


if __name__ == "__main__":
    args = sys.argv[1:]
    ckpt = args[0] if args else "pretrained/droid_dba.msgpack"
    th = tuple(float(a) for a in args[1:]) or (1.2, 1.4, 1.6, 1.8)
    main(ckpt, th)
