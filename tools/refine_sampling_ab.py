#!/usr/bin/env python
"""A/B-validate final_refine's B·S batched sampling (VERDICT r1 #8).

The reference runs `iters` single-random-frame optimizer steps
(/root/reference/src/mapper.py:656-708). The TPU rebuild batches B random
frames × S fused steps per dispatch and counts B·S reference steps — a
sampling-granularity change that must not cost PSNR. This tool runs the
synthetic smoke up to (and including) the pre-refine refresh/deform, then
refines the SAME snapshot twice:

  A: B=4, S=8 (production default)   B: B=1, S=1 (faithful schedule)

and reports render PSNR for each. Usage:

  python tools/refine_sampling_ab.py [--iters 320] [--frames 40]
"""

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=320)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default="/tmp/refine_ab")
    args = ap.parse_args()

    from splatslam_tpu.config import load_config
    from splatslam_tpu.slam import SLAM
    from splatslam_tpu.utils.eval_render import eval_rendering

    cfg = load_config("configs/Synthetic/smoke_oracle.yaml",
                      "configs/splat_slam.yaml")
    cfg["verbose"] = False
    cfg["max_frames"] = args.frames
    cfg["synthetic"]["n_frames"] = args.frames
    cfg["data"]["output"] = args.out
    cfg["mapping"]["final_refine_iters"] = 0   # refresh+deform only
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False

    slam = SLAM(cfg)
    slam.run()
    mapper = slam.mapper

    # snapshot: GaussianState is an immutable pytree (a reference
    # suffices); exposure/Adam-moment dicts and counters are host state
    snap_st = mapper.st
    snap_exp_ab = copy.deepcopy(mapper.exp_ab)
    snap_exp_mv = copy.deepcopy(mapper.exp_mv)
    snap_itc = mapper.iteration_count

    results = {}
    # three arms, all `iters` OPTIMIZER steps:
    #   per_step_S8: production — 8 fused steps/dispatch, one fresh random
    #                frame PER STEP (reference sampling schedule)
    #   batched_B4S8: 4-frame minibatch shared across 8 fused steps
    #   faithful_B1S1: unfused one-frame-one-step loop (ground truth)
    for name, (B, S) in (("per_step_S8", (1, 8)),
                         ("batched_B4S8", (4, 8)),
                         ("faithful_B1S1", (1, 1))):
        mapper.st = snap_st
        mapper.exp_ab = copy.deepcopy(snap_exp_ab)
        mapper.exp_mv = copy.deepcopy(snap_exp_mv)
        mapper.iteration_count = snap_itc
        mapper.cfg["mapping"]["refine_batch"] = B
        mapper.cfg["mapping"]["refine_fused_steps"] = S

        t0 = time.time()
        mapper.final_refine(iters=args.iters)
        done = args.iters
        wall = time.time() - t0
        res = eval_rendering(mapper, os.path.join(args.out, name),
                             slam.stream, global_scale=slam.global_scale,
                             iteration="ab", printer=slam.printer,
                             save_panels=False)
        results[name] = dict(psnr=res["mean_psnr"], ssim=res["mean_ssim"],
                             steps=done, wall_s=round(wall, 1))
        print(f"{name}: PSNR {res['mean_psnr']:.3f} dB  "
              f"SSIM {res['mean_ssim']:.4f}  ({done} steps, {wall:.1f}s)",
              flush=True)

    base = results["faithful_B1S1"]["psnr"]
    for arm in ("per_step_S8", "batched_B4S8"):
        d = results[arm]["psnr"] - base
        print(f"PSNR delta ({arm} - faithful): {d:+.3f} dB "
              f"({'OK <=0.1' if abs(d) <= 0.1 else 'DIVERGES >0.1'})")
    return results


if __name__ == "__main__":
    main()
