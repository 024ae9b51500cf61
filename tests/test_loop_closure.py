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


N_FRAMES = 120


def _cfg(tmp_path, enable_loop):
    cfg = load_config("configs/Synthetic/smoke.yaml",
                      "configs/splat_slam.yaml")
    cfg["verbose"] = False
    cfg["only_tracking"] = True
    cfg["max_frames"] = N_FRAMES
    # pendulum trajectory (loop_period): the camera retraces its own path,
    # so frames 90 apart share EXACT poses — the genuine revisit the loop
    # machinery needs (si-sj > 20 kf separation at sub-thresh distance)
    cfg["synthetic"] = dict(cfg.get("synthetic", {}), n_frames=N_FRAMES,
                            seed=11, motion_scale=8.0, loop_period=45)
    # small-res learned tracking: 96x128 -> 12x16 feature grid
    cfg["cam"] = dict(cfg["cam"], H=96, W=128, fx=80.0, fy=80.0,
                      cx=63.5, cy=47.5, H_out=96, W_out=128,
                      H_edge=0, W_edge=0)
    tr = cfg["tracking"]
    tr["buffer"] = 96
    tr["warmup"] = 5
    # admit ~1 keyframe per 3-4 frames so >20 keyframes separate the
    # revisit pair (the reference loop-edge gate, factor_graph.py:457)
    tr["motion_filter"]["thresh"] = 0.25
    tr["frontend"]["keyframe_thresh"] = 0.15
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
    # The absolute accuracy of this scaled-down scene is limited by the
    # tracker itself, not the loop machinery: at 96x128 the correlation
    # pyramid bottoms out at a 1x2 grid and the self-trained checkpoint
    # drifts ~0.4 on 0.4 m of travel with online/final BA disabled (the
    # official droid.pth is not in this environment). The contract this
    # test can and does enforce: loop edges are built, the loop BA is
    # numerically sane, and closing the loop strictly IMPROVES the
    # trajectory vs the loop-disabled arm (measured here:
    # 0.4025 -> 0.3886 global ATE, 0.4958 -> 0.4243 last-10-kf drift).
    # The run is deterministic (fixed seeds, procedural scene), so a
    # strict < comparison is stable.
    assert ate_loop["rmse"] < 0.45, ate_loop          # bounded (sanity)
    assert ate_loop["rmse"] < ate_base["rmse"], \
        (ate_loop["rmse"], ate_base["rmse"])
