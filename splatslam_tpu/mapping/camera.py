"""Per-keyframe camera state for the mapper.

Reference: thirdparty/monogs/utils/camera_utils.py:13-148 (Camera
nn.Module) and pose_utils.py:30-98 (SE3_exp pose retraction). Here a
camera is a plain host dataclass over jnp leaves: the mapper's jitted
optimization step consumes *stacked* window arrays built from these.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import lie

# NOTE: the reference Camera also computes a Scharr `grad_mask`
# (camera_utils.py:114-137), but nothing in Splat-SLAM consumes it — it
# feeds only MonoGS's tracking loss (slam_utils.py get_loss_tracking_rgb,
# marked "Not used" upstream). We therefore don't compute it.


@dataclasses.dataclass
class Camera:
    uid: int
    image: jnp.ndarray            # (H, W, 3) float [0,1]
    depth: np.ndarray | None      # (H, W) proxy depth (host, re-fused often)
    w2c: jnp.ndarray              # (4, 4) current estimate
    w2c_gt: jnp.ndarray           # (4, 4) from the tracker ("gt" slot in ref)
    exposure_a: float = 0.0
    exposure_b: float = 0.0

    @property
    def R(self):
        return self.w2c[:3, :3]

    @property
    def T(self):
        return self.w2c[:3, 3]

    def update_RT(self, R, t):
        w2c = jnp.eye(4)
        self.w2c = w2c.at[:3, :3].set(R).at[:3, 3].set(t)

    def apply_delta(self, tau):
        """update_pose parity: w2c ← exp([rho, theta]) ∘ w2c, delta reset
        (pose_utils.py:81-98)."""
        dT = lie.to_matrix(lie.exp(jnp.asarray(tau)))
        self.w2c = dT @ self.w2c

def make_camera(uid, image, depth, w2c):
    return Camera(uid=uid, image=jnp.asarray(image),
                  depth=np.asarray(depth) if depth is not None else None,
                  w2c=jnp.asarray(w2c), w2c_gt=jnp.asarray(w2c))
