#!/usr/bin/env python
"""Audit device→host fetches + remote compiles on the SLAM hot path.

Over the tunneled TPU link, a dispatch is ~free (async RPC stream) but
every device→host FETCH costs a ~30 ms round trip (~70 ms/MB for bulk),
and every XLA compile of a not-yet-cached shape costs seconds. FPS is
therefore ≈ frames / (fetch_count · RTT + compile_time + compute).

This tool monkeypatches the two fetch funnels (ArrayImpl.__array__ and
jax.device_get / _value) plus the compile entry point, runs a short bench
loop, and prints per-call-site histograms sorted by total wall time.

Usage:  python tools/fetch_audit.py [n_frames]
"""

import collections
import os
import sys
import time
import traceback

os.environ.setdefault("BENCH_OUT", "/tmp/fetch_audit_out")

FETCHES = collections.Counter()
FETCH_T = collections.Counter()
FETCH_BYTES = collections.Counter()
COMPILES = collections.Counter()
COMPILE_T = collections.Counter()


def _site(skip_modules=("tools/fetch_audit", "jax/", "numpy/")):
    """Innermost stack frame belonging to our code."""
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "splatslam_tpu" in fn or fn.endswith(("bench.py", "run.py")):
            return f"{fn.split('/root/repo/')[-1]}:{fr.lineno} ({fr.name})"
    return "<other>"


def install():
    import jax
    from jax._src import array as jarray

    orig_array = jarray.ArrayImpl.__array__

    def audited_array(self, *a, **k):
        if getattr(self, "_npy_value", None) is not None:
            return orig_array(self, *a, **k)   # cached — no link traffic
        site = _site()
        t0 = time.time()
        out = orig_array(self, *a, **k)
        FETCHES[site] += 1
        FETCH_T[site] += time.time() - t0
        FETCH_BYTES[site] += out.nbytes
        return out

    jarray.ArrayImpl.__array__ = audited_array

    from jax._src.interpreters import pxla
    for name in ("cached_compilation", "compile_or_get_cached"):
        target = getattr(pxla, name, None)
        if target is not None:
            def wrap(fn):
                def inner(*a, **k):
                    t0 = time.time()
                    out = fn(*a, **k)
                    dt = time.time() - t0
                    if dt > 0.05:
                        site = _site()
                        COMPILES[site] += 1
                        COMPILE_T[site] += dt
                    return out
                return inner
            setattr(pxla, name, wrap(target))


def report(top=40):
    print("\n=== device→host fetches by site ===")
    rows = sorted(FETCH_T.items(), key=lambda kv: -kv[1])[:top]
    for site, t in rows:
        print(f"{t*1000:9.0f} ms  {FETCHES[site]:5d}x  "
              f"{FETCH_BYTES[site]/1e6:8.2f} MB  {site}")
    print(f"TOTAL fetch: {sum(FETCH_T.values()):.1f} s, "
          f"{sum(FETCHES.values())} fetches, "
          f"{sum(FETCH_BYTES.values())/1e6:.1f} MB")
    if COMPILES:
        print("\n=== slow compiles (>50ms) by site ===")
        for site, t in sorted(COMPILE_T.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t:9.2f} s  {COMPILES[site]:4d}x  {site}")
        print(f"TOTAL compile: {sum(COMPILE_T.values()):.1f} s")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    install()

    from splatslam_tpu.config import load_config
    from splatslam_tpu.slam import SLAM

    cfg = load_config("configs/Synthetic/smoke_oracle.yaml",
                      "configs/splat_slam.yaml")
    cfg["verbose"] = False
    cfg["max_frames"] = n
    cfg["synthetic"]["n_frames"] = n
    cfg["data"]["output"] = os.environ["BENCH_OUT"]
    cfg["mapping"]["final_refine_iters"] = 16
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False

    slam = SLAM(cfg)
    t_loop = time.time()
    marks = {}

    def on_frame(i, ts, kf):
        marks[i] = (time.time() - t_loop, sum(FETCH_T.values()),
                    sum(FETCHES.values()))

    slam.run(on_frame=on_frame)
    wall = time.time() - t_loop
    print(f"\n{n} frames (incl. terminate) in {wall:.1f} s "
          f"({n / wall:.3f} FPS)")
    if len(marks) > 8:
        w0, f0, c0 = marks[len(marks) // 2]
        w1, f1, c1 = marks[max(marks)]
        print(f"2nd half: {(max(marks) - len(marks)//2)} frames, "
              f"{w1-w0:.1f} s wall, {f1-f0:.1f} s fetch, "
              f"{c1-c0} fetches")
    report()
    print("phase timing:\n" + slam.timers.report())


if __name__ == "__main__":
    main()
