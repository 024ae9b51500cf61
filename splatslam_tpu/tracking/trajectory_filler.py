"""Post-hoc pose recovery for non-keyframes.

Reference: thirdparty/glorie_slam/trajectory_filler.py:23-123 — linear
SE3 interpolation between bracketing keyframes, then 12 motion-only BA
iterations per 16-frame batch against both bracketing keyframes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lie
from .factor_graph import FactorGraph
from .motion_filter import encode_features_batch


class PoseTrajectoryFiller:
    def __init__(self, params, video):
        self.params = params
        self.video = video

    def _fill(self, timestamps, images, intrinsics):
        """One ≤16-frame batch (trajectory_filler.py:48-95).

        Device choreography (vs the reference's 12 separate
        update(motion_only=True) chains): ONE batched feature-encode
        program, M pseudo-keyframe writes (pose+fmap only — the update
        operator never reads the new frames' images), ONE fused
        12-round GRU+MoBA program, ONE pose fetch."""
        N = self.video.counter
        M = len(timestamps)
        s = self.video.state

        ts = np.asarray(s.timestamp[:N])
        tt = np.asarray(timestamps, np.float32)
        t0 = np.asarray([max((ts <= t).sum() - 1, 0) for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        Ps = s.poses[:N]
        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3)
        dP = lie.mul(Ps[jnp.asarray(t1)], lie.inv(Ps[jnp.asarray(t0)]))
        v = lie.log(dP) / dt[:, None]
        w = v * jnp.asarray(tt - ts[t0])[:, None]
        Gs = lie.mul(lie.exp(w), Ps[jnp.asarray(t0)])

        # temporarily append the batch as pseudo-keyframes; edges always
        # point keyframe→new (ii = bracketing kf), so only poses + fmaps
        # of the new frames are ever read — images are not uploaded
        fmap = encode_features_batch(self.params, jnp.stack(images))
        intr8 = jnp.asarray(intrinsics[0]) / float(self.video.down)
        for m in range(M):
            self.video.set_item(
                N + m, float(tt[m]), None, Gs[m], 1.0, None,
                intr8, fmap[m])
        self.video.counter = N + M

        graph = FactorGraph(self.video, self.params, upsample=False)
        graph.add_factors(t0, np.arange(N, N + M))
        graph.add_factors(t1, np.arange(N, N + M))
        graph.update_rounds_motion_only(12, N, N + M)

        out = np.asarray(self.video.state.poses[N:N + M])
        self.video.counter = N
        return out

    def __call__(self, image_stream):
        """Fill poses for every frame (trajectory_filler.py:97-123).
        Returns (n_frames, 7) w2c pose vectors."""
        pose_list, stamps, images, intrs = [], [], [], []
        intrinsic = image_stream.get_intrinsic()
        for i in range(len(image_stream)):
            timestamp, image, _, _ = image_stream[i]
            stamps.append(timestamp)
            images.append(jnp.asarray(image))
            intrs.append(np.asarray(intrinsic))
            if len(stamps) == 16:
                pose_list.append(self._fill(stamps, images, intrs))
                stamps, images, intrs = [], [], []
        if stamps:
            pose_list.append(self._fill(stamps, images, intrs))
        return np.concatenate(pose_list, axis=0)
