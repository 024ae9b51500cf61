#!/usr/bin/env python
"""CLI entry point — reference-compatible (run.py:27-80).

    python run.py configs/Replica/room0.yaml [--only_tracking]
"""

import argparse
import os
import random
import time

import numpy as np


def setup_seed(seed):
    np.random.seed(seed)
    random.seed(seed)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="path to config yaml")
    parser.add_argument("--only_tracking", action="store_true",
                        help="run tracking without mapping")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform override (cpu/tpu)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="write a jax.profiler trace to DIR and print "
                             "per-phase wall timers")
    args = parser.parse_args()

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device

    from splatslam_tpu.config import load_config, save_config
    from splatslam_tpu.slam import SLAM

    cfg = load_config(args.config, "configs/splat_slam.yaml"
                      if os.path.exists("configs/splat_slam.yaml") else None)
    setup_seed(cfg.get("setup_seed", 43))
    if args.only_tracking:
        cfg["only_tracking"] = True
        # reference forces online mono prediction in tracking-only mode
        # (run.py:46-48)
        cfg.setdefault("mono_prior", {})["predict_online"] = True
    if args.profile:
        cfg.setdefault("profiling", {})["trace_dir"] = args.profile
        cfg["profiling"]["timers"] = True

    out_dir = os.path.join(cfg["data"]["output"],
                           str(cfg.get("scene", "scene")))
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.yaml"))

    t0 = time.time()
    slam = SLAM(cfg)
    slam.run()
    dt = time.time() - t0
    n = len(slam.stream)
    print(f"\nDone: {n} frames in {dt:.1f}s ({n / dt:.2f} FPS)")


if __name__ == "__main__":
    main()
