#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line per mode; the LAST line is the
headline metric (oracle-mode end-to-end FPS).

Measured modes of the full SLAM pipeline on the procedural Synthetic
scene:
  * oracle  - GT flow targets (no learned net in the loop), 240x320.
    Headline.
  * learned - the pretrained DBA-trained update operator (corr + ConvGRU
    + DBA in the hot loop; reference factor_graph.py:226-270). Reports
    kf-ATE from the same run so the flagship model's accuracy rides the
    bench JSON (VERDICT r2 item 2).
  * replica_scale - oracle tracking at the reference's native workload
    shape (320x640, 131k Gaussians, K=256, window 10) so perf is
    measured where the reference actually runs (VERDICT r4 item 6).
  * dpt - oracle tracking + the omnidata DPT-hybrid mono prior running
    per admitted keyframe (512^2 ViT forward), so the mono net's cost
    appears in a measured FPS number (VERDICT r4 item 7); random weights
    when the ckpt is absent (cost-faithful, quality gated on weights).

Robustness contract (round-1 failure was rc=124 with NO output at all):
  * a partial JSON line is printed after every frame, so a timeout still
    leaves a parsable result;
  * SIGTERM/SIGINT print the latest partial line and exit 0;
  * compile time is reported separately from steady state: the first
    `BENCH_WARM` frames' wall time is attributed to warmup (JIT compiles /
    persistent-cache loads), and `steady_fps` excludes it. The headline
    `value` stays the honest total-wall-clock FPS.

`vs_baseline` is value / 3.0: the north-star is >=2x the CUDA reference
(BASELINE.md), and the reference class of systems runs ~1.5 FPS on
consumer GPUs, so 3.0 FPS ~= the 2x target; vs_baseline >= 1.0 means the
target is met. (No measured in-tree reference numbers exist —
BASELINE.json `published` is empty.)

Env knobs: BENCH_FRAMES (60), BENCH_WARM (16), BENCH_REFINE (128),
BENCH_MODES ("oracle,learned" | "oracle" | "learned"),
BENCH_PHASES=1 (per-frame phase dicts), BENCH_OUT, BENCH_TUNNEL_PROBE_S.
BENCH_PRIME_FRAMES caps the prime pass length; the default full-length
prime roughly DOUBLES bench wall time (it replays the whole schedule so
every shape bucket is warm) — results carry prime_ok/prime_s so cold
runs are distinguishable.
"""

import json
import os
import signal
import sys
import time

BASELINE_FPS = 3.0

state = {
    "t0": None,            # loop start
    "t_warm_end": None,    # end of warmup frames
    "frames": 0,
    "n_frames": 0,
    "warm_frames": 0,
    "metric": "e2e_fps_synthetic_oracle",
    "probe": None,
    "last_final": None,    # last completed mode's final line (re-emitted
                           # on SIGTERM so the tail line stays a result)
}


def result_line(partial):
    now = time.time()
    wall = max(now - state["t0"], 1e-9) if state["t0"] else 0.0
    f = state["frames"]
    fps = f / wall if wall > 0 else 0.0
    out = {
        "metric": state["metric"],
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "partial": partial,
        "frames": f,
        "wall_s": round(wall, 2),
    }
    if state["t_warm_end"] is not None and f > state["warm_frames"]:
        steady_wall = now - state["t_warm_end"]
        steady_f = f - state["warm_frames"]
        out["steady_fps"] = round(steady_f / max(steady_wall, 1e-9), 4)
        out["warmup_s"] = round(state["t_warm_end"] - state["t0"], 2)
    return out


def emit(partial=True):
    print(json.dumps(result_line(partial)), flush=True)


def _bail(signum, frame):
    emit(partial=True)
    if state["last_final"] is not None:
        print(json.dumps(state["last_final"]), flush=True)
    os._exit(0)


def _probe_tunnel_alive(timeout_s: int) -> bool:
    """Bounded liveness check of the (tunneled, sometimes-down) TPU in a
    SUBPROCESS — jax backend init has no timeout of its own, and a dead
    tunnel otherwise hangs the bench before the first partial line."""
    import subprocess
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "np.asarray(jnp.zeros(4) + 1.0); print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return b"ok" in r.stdout
    except Exception:
        return False


def _probe_link():
    """Record link/chip conditions: the tunneled TPU is SHARED — run-to-run
    FPS varies with link RTT and chip contention, so every result carries
    the probe values it was measured under."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    x = jnp.zeros(8)
    np.asarray(x + 1)
    t0 = time.time()
    for _ in range(8):
        np.asarray(jnp.sum(x))
    rtt_ms = (time.time() - t0) / 8 * 1e3
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    np.asarray(mm(a)[:1, :1])
    t0 = time.time()
    for _ in range(10):
        out = mm(a)
    np.asarray(out[:1, :1])
    tflops = 2 * 4096 ** 3 / ((time.time() - t0) / 10) / 1e12
    return {"link_rtt_ms": round(rtt_ms, 1),
            "matmul_tflops": round(tflops, 1)}


_PRIMED_SHAPES = set()   # cam (H, W) configs fully primed this process


def run_mode(mode: str, n_frames: int, warm: int):
    """Run the full pipeline in `mode` ('oracle'|'learned'); returns the
    final result dict (also printed)."""
    from splatslam_tpu.config import load_config
    from splatslam_tpu.slam import SLAM

    base = {
        "oracle": "configs/Synthetic/smoke_oracle.yaml",
        "learned": "configs/Synthetic/smoke.yaml",
        # reference-native workload shape: 320x640, 131k capacity, K=256,
        # window 10, init 1050 iters (VERDICT r4 item 6; reference
        # splat_slam.yaml:90 buffer/window class)
        "replica_scale": "configs/Synthetic/replica_scale.yaml",
        # mono-prior-in-the-loop: the DPT-hybrid 512^2 forward runs per
        # admitted keyframe (reference mono_estimators.py:49-73). Uses
        # randomly initialized weights when the omnidata ckpt is absent
        # from the env — the COST structure is what this mode measures;
        # depth quality is gated on real weights existing
        "dpt": "configs/Synthetic/smoke_oracle.yaml",
    }[mode]
    cfg = load_config(base, "configs/splat_slam.yaml")
    if mode == "dpt":
        # NOTE: no `import os.path` here — an inner import of the `os`
        # package would make `os` function-local and break every
        # `os.environ` read in this function (shipped broken once:
        # UnboundLocalError in ALL modes)
        import shutil
        ck = "pretrained/omnidata_dpt_depth_v2.ckpt"
        cfg["mono_prior"] = dict(cfg.get("mono_prior", {}),
                                 provider="dpt",
                                 depth_pretrained=(ck if os.path.exists(ck)
                                                   else None),
                                 predict_online=True, save_depths=False)
        # depths .npy cached by a previous bench invocation would replace
        # the DPT forward with an np.load — the exact cost this mode
        # exists to measure
        for sfx in ("", "_prime"):
            shutil.rmtree(os.path.join(
                os.environ.get("BENCH_OUT", "/tmp/bench_out") + "_dpt"
                + sfx, "mono_priors"), ignore_errors=True)
    cfg["verbose"] = False
    cfg["max_frames"] = n_frames
    cfg["synthetic"]["n_frames"] = n_frames
    cfg["data"]["output"] = os.environ.get(
        "BENCH_OUT", "/tmp/bench_out") + f"_{mode}"
    cfg["mapping"]["final_refine_iters"] = int(
        os.environ.get("BENCH_REFINE", "128"))
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False   # per-keyframe panels cost host time

    state.update(metric=f"e2e_fps_synthetic_{mode}", frames=0,
                 t0=None, t_warm_end=None, n_frames=n_frames,
                 warm_frames=min(warm, n_frames))

    # Prime pass (VERDICT r2 item 8): run a miniature pipeline (same cam /
    # buffer / capacity config => same compiled program shapes) BEFORE the
    # measured loop so jit compiles and persistent-cache loads land in
    # setup, not in the measured frames. Module-level @jax.jit caches are
    # shared across SLAM instances, so the measured run starts warm.
    prime_s = 0.0
    prime_ok = None
    if os.environ.get("BENCH_PRIME", "1") != "0":
        import copy
        pcfg = copy.deepcopy(cfg)
        # FULL-length prime: the geometric shape buckets (keyframe count,
        # BA edges, factor-graph pools) cross boundaries throughout the
        # run, and every first touch of a bucket pays a persistent-cache
        # load (seconds over the tunnel) or a remote compile (tens of
        # seconds). A 14-frame prime left frames 15+ of the measured loop
        # eating those stalls (measured: frames 1-14 at 1.3 FPS, then a
        # ~280 s stall band). Prime cost is dominated by the one-time
        # session establishment, not frames, so prime the whole schedule.
        # Same-shape modes share nearly the whole warm set in-process
        # (module-level jit caches): the first mode at a cam shape pays
        # the full-schedule prime (its cost is dominated by one-time
        # program loads over the tunnel, not frames); later same-shape
        # modes only need the handful of mode-specific tracking programs
        # — a short prime reaches those (VERDICT r4 item 10: bench wall
        # was 60-88 % priming)
        # Same-shape prime reuse is only sound when the earlier mode
        # compiled the same PROGRAM SET: oracle vs learned differ in the
        # tracking programs AND in which BA programs the schedule
        # touches (e.g. the learned smoke disables online BA, so its
        # full prime never compiles the dense-BA pools oracle needs —
        # measured: a 32-frame oracle prime after the learned mode left
        # fe.rounds/loop_ba/final_ba eating remote compiles in the
        # MEASURED run, 148 s wall vs 34 s warm). Key on the config
        # facets that select programs, not just the cam shape.
        tr = cfg["tracking"]
        shape_key = (cfg["cam"]["H_out"], cfg["cam"]["W_out"],
                     bool(tr.get("oracle", False)),
                     bool(tr["frontend"].get("enable_online_ba", True)),
                     bool(tr["frontend"].get("enable_loop", True)),
                     mode == "dpt")
        default_pn = n_frames if shape_key not in _PRIMED_SHAPES else \
            min(32, n_frames)
        _PRIMED_SHAPES.add(shape_key)
        pn = int(os.environ.get("BENCH_PRIME_FRAMES", str(default_pn)))
        pn = min(pn, n_frames)
        pcfg["max_frames"] = pn
        pcfg["synthetic"]["n_frames"] = pn
        pcfg["data"]["output"] = cfg["data"]["output"] + "_prime"
        pcfg["mapping"]["final_refine_iters"] = 8
        t_p = time.time()
        prime_ok = True
        try:
            SLAM(pcfg).run()
        except Exception as e:
            # a failed prime means the measured run starts COLD — the
            # result line carries prime_ok so such numbers are never
            # silently compared against warm-prime runs
            prime_ok = False
            print(json.dumps({"event": "prime_failed",
                              "error": f"{type(e).__name__}: {e}"}),
                  file=sys.stderr, flush=True)
        prime_s = round(time.time() - t_p, 2)
        print(json.dumps({"event": "prime_done", "mode": mode,
                          "prime_s": prime_s}),
              file=sys.stderr, flush=True)

    t_setup = time.time()
    slam = SLAM(cfg)
    print(json.dumps({"event": "setup_done", "mode": mode,
                      "setup_s": round(time.time() - t_setup, 2)}),
          file=sys.stderr, flush=True)

    state["t0"] = time.time()

    def on_frame(i, timestamp, kf_idx):
        state["frames"] = i + 1
        if state["frames"] == state["warm_frames"]:
            state["t_warm_end"] = time.time()
        out = result_line(partial=True)
        if os.environ.get("BENCH_PHASES"):
            out["phases"] = slam.timers.as_dict()
        print(json.dumps(out), flush=True)

    t_loop = time.time()
    ate_stats = slam.run(on_frame=on_frame)
    t_done = time.time()

    # final honest number: frames / (loop + terminate) wall
    wall = t_done - t_loop
    fps = n_frames / wall
    out = result_line(partial=False)
    out.update({
        "value": round(fps, 4),
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "partial": False,
        "wall_s": round(wall, 2),
        "phases": slam.timers.as_dict(),
    })
    # achieved-FLOPs line: host-side analytic workload model (see
    # factor_graph.update_rounds / mapper._run_iters producers) over the
    # honest end-to-end wall. MFU vs the v5e bf16 MXU peak (394 TF/s) —
    # a mixed VPU/f32 pipeline can't reach it; the line exists to make
    # perf progress measurable run-over-run.
    fl = (getattr(slam.video, "flops_tracking", 0.0)
          + getattr(slam.video, "flops_mapping", 0.0))
    if fl > 0:
        out["achieved_tflops"] = round(fl / wall / 1e12, 3)
        out["mfu"] = round(fl / wall / 394e12, 5)
    if isinstance(ate_stats, dict) and "rmse" in ate_stats:
        out["kf_ate_rmse"] = round(float(ate_stats["rmse"]), 6)
    if prime_ok is not None:
        out["prime_s"] = prime_s
        out["prime_ok"] = prime_ok
    if state["probe"]:
        out["probe"] = state["probe"]
    return out


def main():
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _bail)

    probe_s = int(os.environ.get("BENCH_TUNNEL_PROBE_S", "420"))
    if probe_s > 0 and not _probe_tunnel_alive(probe_s):
        # emit a parsable result that says WHY the value is zero rather
        # than hanging until the driver's timeout kills us silently
        out = result_line(partial=True)
        out["error"] = ("tpu_unreachable: backend init did not complete "
                        f"within {probe_s}s (tunnel down?)")
        print(json.dumps(out), flush=True)
        return

    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    warm = int(os.environ.get("BENCH_WARM", "16"))
    # order matters under an external timeout: the earliest modes' finals
    # survive via state["last_final"]/partial lines, so the two
    # round-tracked headline modes run first
    modes = os.environ.get(
        "BENCH_MODES", "learned,oracle,replica_scale,dpt").split(",")

    state["probe"] = _probe_link()
    print(json.dumps({"event": "probe", **state["probe"]}),
          file=sys.stderr, flush=True)

    finals = []
    for mode in modes:
        try:
            out = run_mode(mode.strip(), n_frames, warm)
        except Exception as e:  # one mode failing must not kill the other
            out = result_line(partial=True)
            out["error"] = f"{type(e).__name__}: {e}"
            import traceback
            traceback.print_exc(file=sys.stderr)
        print(json.dumps(out), flush=True)
        state["last_final"] = out
        finals.append(out)

    # Re-emit every mode's final so they all land in the driver's short
    # output tail (per-frame partial lines push the first mode's final
    # hundreds of lines up). The LAST printed line is the headline: the
    # oracle-mode final if it ran, else the last mode's final.
    headline = next((f for f in reversed(finals)
                     if f.get("metric") == "e2e_fps_synthetic_oracle"
                     and not f.get("partial", True)), finals[-1] if finals
                    else None)
    for f in finals:
        if f is not headline:
            print(json.dumps(f), flush=True)
    if headline is not None:
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
