"""Mapping losses + image metrics.

Reference: thirdparty/monogs/utils/slam_utils.py:10-119 (mapping loss,
Scharr gradients), thirdparty/gaussian_splatting/utils/loss_utils.py:42-101
(11×11 gaussian-window SSIM), image_utils.py:19 (psnr). Channel-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(a, b):
    return jnp.abs(a - b).mean()


def psnr(img, gt, mask=None):
    if mask is not None:
        mse = jnp.sum(((img - gt) ** 2) * mask) / jnp.clip(mask.sum(), 1)
    else:
        mse = ((img - gt) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.clip(mse, 1e-12)))


def _gaussian_window(size=11, sigma=1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _band_matrix(n, size=11, sigma=1.5):
    """Zero-padded 1D gaussian filtering along an axis of length n as an
    (n, n) band matrix. The 11×11 window is separable (outer(g, g)), and
    on TPU a band-matrix matmul runs on the MXU while a 1-channel conv
    crawls on the VPU — measured ~25 ms/iter of map_step at smoke scale
    for the conv form of SSIM (fwd+bwd, B=8)."""
    import numpy as np
    x = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    idx = np.arange(n)
    off = idx[None, :] - idx[:, None] + size // 2     # window tap index
    band = np.where((off >= 0) & (off < size), g[np.clip(off, 0, size - 1)],
                    0.0).astype(np.float32)
    return band                                        # np: HLO literal


def ssim(img1, img2, window_size=11):
    """SSIM over (H, W, C) images in [0,1] (loss_utils.py:61-101 parity:
    zero-padded 11×11 gaussian window, matching torch conv2d padding=5)."""
    H, W = img1.shape[0], img1.shape[1]
    A_h = jnp.asarray(_band_matrix(H, window_size))    # rows filter
    A_w = jnp.asarray(_band_matrix(W, window_size))    # cols filter

    def filt(x):
        # (H,W,C): two MXU matmuls — filter rows, then columns
        C = x.shape[-1]
        t = (A_h @ x.reshape(H, W * C).astype(jnp.float32)).reshape(H, W, C)
        t = jnp.einsum("wv,hvc->hwc", A_w, t,
                       preferred_element_type=jnp.float32)
        return t

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu12 = mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()


def image_gradient(image):
    """Scharr gradients of (H, W) or (H, W, C)→mean gray image
    (slam_utils.py:10-27). Returns (grad_v, grad_h)."""
    if image.ndim == 3:
        image = image.mean(-1)
    conv_y = jnp.asarray([[3., 0, -3], [10, 0, -10], [3, 0, -3]]) / 32.0
    conv_x = jnp.asarray([[3., 10, 3], [0, 0, 0], [-3, -10, -3]]) / 32.0
    pad = jnp.pad(image, 1, mode="reflect")[None, None]
    gv = jax.lax.conv_general_dilated(pad, conv_x[None, None], (1, 1),
                                      "VALID")[0, 0]
    gh = jax.lax.conv_general_dilated(pad, conv_y[None, None], (1, 1),
                                      "VALID")[0, 0]
    return gv, gh


def image_gradient_mask(image, eps=0.01):
    """Validity of the 3×3 neighborhood (slam_utils.py:30-44)."""
    if image.ndim == 3:
        image = image.mean(-1)
    ok = (jnp.abs(jnp.pad(image, 1, mode="reflect")) > eps).astype(jnp.float32)
    k = jnp.ones((1, 1, 3, 3))
    s = jax.lax.conv_general_dilated(ok[None, None], k, (1, 1), "VALID")[0, 0]
    full = (s == 9.0)
    return full, full


def mapping_loss(image, depth, gt_image, gt_depth, alpha=0.8,
                 rgb_boundary_threshold=0.01, use_ssim=False,
                 lambda_dssim=0.2):
    """get_loss_mapping_rgbd parity (slam_utils.py:80-105).

    image/gt_image (H,W,3); depth/gt_depth (H,W).
    """
    rgb_mask = (gt_image.sum(-1) > rgb_boundary_threshold)[..., None]
    l1_rgb = jnp.abs(image * rgb_mask - gt_image * rgb_mask)
    if use_ssim:
        loss_rgb = ((1 - lambda_dssim) * l1_rgb
                    + lambda_dssim * (1.0 - ssim(image, gt_image)))
    else:
        loss_rgb = l1_rgb
    depth_mask = gt_depth > 0.01
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return alpha * loss_rgb.mean() + (1 - alpha) * l1_depth.mean()


def get_median_depth(depth, opacity=None, mask=None):
    """Median of valid rendered depth (slam_utils.py:108-119)."""
    valid = depth > 0
    if opacity is not None:
        valid = valid & (opacity > 0.95)
    if mask is not None:
        valid = valid & mask
    vals = jnp.where(valid, depth, jnp.nan)
    return jnp.nanmedian(vals)
