"""Frontend: sliding-window local BA with keyframe culling + loop closure.

Reference: thirdparty/glorie_slam/frontend.py:19-145 — the same control
flow (bootstrap after `warmup` keyframes, per-keyframe proximity edges,
alternating DSPO stages, distance-based keyframe culling, loop BA).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .factor_graph import FactorGraph
from .backend import Backend


@partial(jax.jit, static_argnames=("mean_win",))
def _seed_next(poses, disps, t1, *, mean_win: int):
    """Seed frame t1 from t1-1: copy pose, set disparity to the mean of
    the last `mean_win` frames (frontend.py:95-96 / :129-130). One
    program — eagerly this was 5-7 dispatches per keyframe."""
    poses = poses.at[t1].set(poses[t1 - 1])
    if mean_win == 1:
        m = disps[t1 - 1].mean()
    else:
        # dynamic window [t1-mean_win, t1)
        sl = jax.lax.dynamic_slice_in_dim(disps, t1 - mean_win, mean_win, 0)
        m = sl.mean()
    disps = disps.at[t1].set(m)
    return poses, disps


class Frontend:
    def __init__(self, params, video, cfg):
        self.video = video
        self.params = params
        self.t1 = 0
        self.is_initialized = False

        tr = cfg["tracking"]
        self.max_age = tr["max_age"]
        self.iters1 = 4 * 2
        self.iters2 = 2 * 2
        self.warmup = tr["warmup"]
        self.beta = tr["beta"]
        fe = tr["frontend"]
        self.frontend_nms = fe["nms"]
        self.keyframe_thresh = fe["keyframe_thresh"]
        self.frontend_window = fe["window"]
        self.frontend_thresh = fe["thresh"]
        self.frontend_radius = fe["radius"]
        self.frontend_max_factors = fe["max_factors"]
        self.enable_loop = fe["enable_loop"]

        self.oracle = tr.get("oracle", False)
        self.loop_closing = Backend(params, video, cfg)
        self.graph = FactorGraph(video, params,
                                 max_factors=self.frontend_max_factors,
                                 oracle=self.oracle)
        self.last_loop_t = -1
        # speculative edge-proposal prefetch (see _dispatch_spec)
        self._spec = None
        from ..utils.profiling import PhaseTimers
        self.timers = PhaseTimers()   # replaced by SLAM's shared timers

    def _take_spec(self):
        """Return the prefetched proposal distances if they were computed
        from exactly the state this call observes (same pose/disp
        generation, same keyframe indices), else None."""
        sp, self._spec = self._spec, None
        if sp is None:
            return None
        if (sp["gen"] != self.video.pose_gen
                or sp["t"] != self.video.counter or sp["t1"] != self.t1):
            return None
        return np.asarray(sp["dev"])[:sp["n"]]

    def _dispatch_spec(self):
        """Prefetch the NEXT keyframe's edge-proposal distance array.

        After _seed_next, the poses/disps the next __update's
        add_proximity_factors will read are fully determined (the next
        admitted frame is appended with pose=None/disp=None, keeping the
        seeded values), so the directed frame-distance kernel for the
        next pair grid can run NOW — its result crosses the link during
        the inter-keyframe tracking work instead of serializing the next
        keyframe's first sync behind the queued mapper/rounds programs.
        Any pose/disp writer in between (online/loop BA, rm_keyframe)
        bumps video.pose_gen and the speculation falls back to the
        synchronous path."""
        t = self.video.counter + 1
        t1 = self.t1 + 1
        ix_r = np.arange(t1 - 5, t)
        jx_r = np.arange(max(t1 - self.frontend_window, 0), t)
        if len(ix_r) == 0 or len(jx_r) == 0:
            return
        ii, jj = np.meshgrid(ix_r, jx_r, indexing="ij")
        dev, n = self.video.distance_async(
            ii.reshape(-1), jj.reshape(-1), beta=self.beta)
        self._spec = dict(dev=dev, n=n, gen=self.video.pose_gen,
                          t=t, t1=t1)

    def __update(self):
        """Per-keyframe update (frontend.py:54-100)."""
        T = self.timers
        self.t1 += 1
        if len(self.graph.ii) > 0:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        with T("fe.edges"):
            self.graph.add_proximity_factors(
                self.t1 - 5, max(self.t1 - self.frontend_window, 0),
                rad=self.frontend_radius, nms=self.frontend_nms,
                thresh=self.frontend_thresh, beta=self.beta, remove=True,
                dist_override=self._take_spec())

        with T("fe.rounds"):
            # the keyframe-cull distance d(t1-2, t1-1) rides the fused
            # rounds program (frontend.py:85-86 ran it as a separate
            # kernel + its own device→host sync per keyframe)
            d = self.graph.update_rounds(
                tuple("pose_depth" if itr % 2 == 0 else "depth_scale"
                      for itr in range(self.iters1)),
                None, None, use_inactive=True,
                cull_pair=(self.t1 - 2, self.t1 - 1), cull_beta=self.beta)

        with T("fe.dist"):
            d = float(d) if d is not None else float(
                self.video.distance([self.t1 - 2], [self.t1 - 1],
                                    beta=self.beta, bidirectional=True)[0])

        if d < self.keyframe_thresh:
            with T("fe.rm_kf"):
                self.graph.rm_keyframe(self.t1 - 1)
                self.video.counter -= 1
                self.t1 -= 1
        else:
            cur_t = self.video.counter
            if self.enable_loop and cur_t > self.frontend_window:
                with T("fe.loop_ba"):
                    _, n_edge = self.loop_closing.loop_ba(
                        t_start=0, t_end=cur_t, steps=self.iters2,
                        motion_only=False, local_graph=self.graph,
                        enable_wq=True)
                if n_edge == 0:
                    with T("fe.rounds"):
                        self.graph.update_rounds(
                            tuple("pose_depth" if itr % 2 == 0
                                  else "depth_scale"
                                  for itr in range(self.iters2)),
                            None, None, use_inactive=True)
                self.last_loop_t = cur_t
            else:
                with T("fe.rounds"):
                    self.graph.update_rounds(
                        tuple("pose_depth" if itr % 2 == 0
                              else "depth_scale"
                              for itr in range(self.iters2)),
                        None, None, use_inactive=True)

        # seed next frame: copy pose, set disparity to the mean
        # (frontend.py:95-96)
        s = self.video.state
        s.poses, s.disps = _seed_next(
            s.poses, s.disps, jnp.asarray(np.asarray(self.t1, np.int32)), mean_win=1)

        if len(self.graph.ii) > 0:
            self.video.set_dirty(int(self.graph.ii.min()), self.t1)
        self._dispatch_spec()

    def __initialize(self):
        """Bootstrap after warmup keyframes (frontend.py:102-131)."""
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(0, self.t1, r=3)
        self.graph.update_rounds(("pose_depth",) * 8, 1, use_inactive=True)

        self.graph.add_proximity_factors(0, 0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        self.graph.update_rounds(("pose_depth",) * 8, 1, use_inactive=True)

        s = self.video.state
        s.poses, s.disps = _seed_next(
            s.poses, s.disps, jnp.asarray(np.asarray(self.t1, np.int32)), mean_win=4)

        self.is_initialized = True
        self.video.set_dirty(0, self.t1)
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)

    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self.__initialize()
            self.video.update_valid_depth_mask()
        elif self.is_initialized and self.t1 < self.video.counter:
            self.__update()
            self.video.update_valid_depth_mask()
