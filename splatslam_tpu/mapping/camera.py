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


# NOTE: the reference Camera also computes a Scharr `grad_mask`
# (camera_utils.py:114-137), but nothing in Splat-SLAM consumes it — it
# feeds only MonoGS's tracking loss (slam_utils.py get_loss_tracking_rgb,
# marked "Not used" upstream). We therefore don't compute it.


@dataclasses.dataclass
class Camera:
    uid: int
    image: jnp.ndarray            # (H, W, 3) float [0,1], device-resident
    depth: jnp.ndarray | None     # (H, W) proxy depth, device-resident
    w2c: np.ndarray               # (4, 4) current estimate — HOST numpy:
    #   the keyframe-window logic (is_keyframe / add_to_window) reads poses
    #   O(window²) times per keyframe; a device-resident 4×4 would cost one
    #   ~30 ms link round trip per read
    w2c_gt: np.ndarray            # (4, 4) from the tracker ("gt" slot in ref)
    exposure_a: float = 0.0
    exposure_b: float = 0.0

    @property
    def R(self):
        return self.w2c[:3, :3]

    @property
    def T(self):
        return self.w2c[:3, 3]

    def update_RT(self, R, t):
        w2c = np.eye(4, dtype=np.float64)
        w2c[:3, :3] = np.asarray(R)
        w2c[:3, 3] = np.asarray(t)
        self.w2c = w2c

    # NOTE: pose-delta retraction (update_pose parity) happens INSIDE
    # map_step on device (mapper.py map_step opt_poses path) — a host
    # apply_delta helper would cost a device round trip per call.


def make_camera(uid, image, depth, w2c):
    # w2c_gt gets its own COPY: aliasing the same ndarray would let any
    # in-place w2c edit silently corrupt the tracker reference pose
    return Camera(uid=uid, image=jnp.asarray(image),
                  depth=jnp.asarray(depth) if depth is not None else None,
                  w2c=np.asarray(w2c), w2c_gt=np.array(w2c))
