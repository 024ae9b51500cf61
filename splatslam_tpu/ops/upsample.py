"""Learned convex 8× upsampling of disparity fields.

TPU-native equivalent of the reference cvx_upsample
(thirdparty/glorie_slam/modules/droid_net/droid_net.py:23-45): a softmax
over 9 spatial neighbors × 8×8 sub-pixel positions. The torch F.unfold
gather becomes 9 static padded slices (pure data movement XLA fuses), and
the pixel shuffle is a reshape/transpose.

Mask channel layout matches the torch view(batch, 1, 9, 8, 8, ht, wd):
channel c = ((m·8 + sy)·8 + sx) with neighbor m = ky·3 + kx (ky/kx over
the 3×3 window, y-major — torch unfold order), so GraphAgg upmask outputs
convert without permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cvx_upsample(data: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """data (B, H, W, C); mask (B, H, W, 576) → (B, 8H, 8W, C)."""
    B, H, W, C = data.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [padded[:, ky:ky + H, kx:kx + W] for ky in range(3) for kx in range(3)],
        axis=3)                                        # (B,H,W,9,C)

    up = jnp.einsum("bhwnyx,bhwnc->bhwyxc", m, neigh)  # (B,H,W,8,8,C)
    up = up.transpose(0, 1, 3, 2, 4, 5)                # (B,H,8,W,8,C)
    return up.reshape(B, 8 * H, 8 * W, C)


def upsample_disp(disp: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """disp (B, H, W); mask (B, H, W, 576) → (B, 8H, 8W)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


def upsample_disp_uniform(disp: jnp.ndarray) -> jnp.ndarray:
    """Zero-mask cvx_upsample, computed directly: softmax(0) over the 9
    neighbors is uniform, so every 8×8 sub-pixel gets the 3×3 neighborhood
    mean. Used by the oracle tracking path — mathematically identical to
    `upsample_disp(disp, zeros(576))` but without materializing (and
    compile-time constant-folding) a 576-channel zero mask, which cost
    >10 s of XLA constant folding per compiled program."""
    B, H, W = disp.shape
    padded = jnp.pad(disp, ((0, 0), (1, 1), (1, 1)))
    neigh = sum(padded[:, ky:ky + H, kx:kx + W]
                for ky in range(3) for kx in range(3)) / 9.0
    up = jnp.broadcast_to(neigh[:, :, None, :, None], (B, H, 8, W, 8))
    return up.reshape(B, 8 * H, 8 * W)
