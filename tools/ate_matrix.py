#!/usr/bin/env python
"""Learned-tracking ATE ablation matrix on the bench scene.

Runs only_tracking arms of the full pipeline (60 frames, 240x320) with
one knob changed per arm, printing kf-ATE per arm — used to attribute
learned-mode drift (checkpoint quality vs BA config vs admission
density vs online/loop BA). Arms share one process so jit caches stay
warm; run on the TPU.

Usage: python tools/ate_matrix.py [arm ...]
"""
import sys

sys.path.insert(0, ".")

import copy

from splatslam_tpu.config import load_config


def base_cfg():
    import os
    cfg = load_config("configs/Synthetic/smoke.yaml",
                      "configs/splat_slam.yaml")
    ck = os.environ.get("SPLATSLAM_CKPT")
    if ck:
        cfg["tracking"]["pretrained"] = ck
    cfg["verbose"] = False
    cfg["only_tracking"] = True
    cfg["max_frames"] = 60
    cfg["synthetic"]["n_frames"] = 60
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False
    return cfg


ARMS = {
    "base": {},
    "noba": {("tracking", "frontend", "enable_online_ba"): False,
             ("tracking", "frontend", "enable_loop"): False},
    "dba": {("tracking", "backend", "BA_type"): "DBA"},
    "sparse": {("tracking", "motion_filter", "thresh"): 1.8},
    "dense": {("tracking", "motion_filter", "thresh"): 1.0},
    "iters16": {"_iters": (16, 8)},
    "nonorm": {("tracking", "backend", "normalize"): False},
    # reference-default online-BA cadence (splat_slam.yaml:108 ba_freq
    # 20 vs the smoke override 10) + admission matched to oracle density
    "ref_cadence": {("tracking", "backend", "ba_freq"): 20,
                    ("tracking", "motion_filter", "thresh"): 1.6},
    "loop_only": {("tracking", "frontend", "enable_online_ba"): False,
                  ("tracking", "motion_filter", "thresh"): 1.6},
    "t16": {("tracking", "motion_filter", "thresh"): 1.6},
}


def run_arm(name, overrides):
    from splatslam_tpu.slam import SLAM
    cfg = base_cfg()
    cfg["data"]["output"] = f"/tmp/ate_matrix/{name}"
    iters = None
    for k, v in overrides.items():
        if k == "_iters":
            iters = v
            continue
        d = cfg
        for part in k[:-1]:
            d = d[part]
        d[k[-1]] = v
    slam = SLAM(cfg)
    if iters is not None:
        slam.frontend.iters1, slam.frontend.iters2 = iters
    ate = slam.run()
    n_kf = slam.video.counter
    rmse = ate.get("rmse") if isinstance(ate, dict) else ate
    print(f"ARM {name:8s} kf_ate {rmse}  n_kf {n_kf}", flush=True)
    return rmse


if __name__ == "__main__":
    arms = sys.argv[1:] or list(ARMS)
    for a in arms:
        try:
            run_arm(a, ARMS[a])
        except Exception as e:
            print(f"ARM {a:8s} FAILED {type(e).__name__}: {e}", flush=True)
