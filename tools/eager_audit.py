#!/usr/bin/env python
"""Count EAGER (outside-jit) primitive dispatches by repo call site.

Every eager jnp op costs a device dispatch on TPU (~0.2-1.5 ms over the
tunnel) and one compiled-program cache load at warmup — ~430 of the
~537 programs a smoke run loads are these one-op programs. This audit
patches jax's EvalTrace.process_primitive (the eager execution funnel)
and attributes each dispatch to the innermost /root/repo stack frame.

Usage: PYTHONPATH=<repo> JAX_PLATFORMS=cpu python tools/eager_audit.py \
           [config] [--frames N]
"""

import argparse
import collections
import sys
import traceback

sys.path.insert(0, ".")

import jax._src.core as core

SITES = collections.Counter()
PRIMS = collections.Counter()
_ORIG = core.EvalTrace.process_primitive


def _wrapped(self, prim, tracers, params):
    st = traceback.extract_stack(limit=30)
    for fr in reversed(st):
        if "splatslam_tpu" in fr.filename or fr.filename.endswith(
                ("run.py", "bench.py")):
            SITES[f"{fr.filename.rsplit('/', 1)[-1]}:{fr.lineno} "
                  f"({fr.name})"] += 1
            break
    else:
        SITES["<outside-repo>"] += 1
    PRIMS[prim.name] += 1
    return _ORIG(self, prim, tracers, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?",
                    default="configs/Synthetic/smoke_oracle.yaml")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    core.EvalTrace.process_primitive = _wrapped

    from splatslam_tpu.config import load_config
    from splatslam_tpu.slam import SLAM
    cfg = load_config(args.config, "configs/splat_slam.yaml")
    cfg["max_frames"] = args.frames
    cfg.setdefault("synthetic", {})["n_frames"] = args.frames
    cfg["mapping"]["final_refine_iters"] = 8
    SLAM(cfg).run()

    tot = sum(SITES.values())
    print(f"\n=== eager dispatches: {tot} total, "
          f"{tot / max(args.frames, 1):.1f}/frame ===")
    for s, c in SITES.most_common(args.top):
        print(f"{c:6d}  {s}")
    print("=== by primitive ===")
    for s, c in PRIMS.most_common(12):
        print(f"{c:6d}  {s}")


if __name__ == "__main__":
    main()
