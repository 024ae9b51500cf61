"""Rendering evaluation: PSNR / SSIM / LPIPS / depth-L1 per mapped keyframe.

Reference: src/utils/eval_utils.py:38-212 (eval_rendering). LPIPS needs
pretrained AlexNet weights that cannot be downloaded in this environment;
it is gated — reported as None when unavailable, like-for-like otherwise
via torchmetrics.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..mapping.losses import psnr, ssim


def _try_lpips():
    try:
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity)
        return LearnedPerceptualImagePatchSimilarity(
            net_type="alex", normalize=True)
    except Exception:
        return None


def eval_rendering(mapper, save_dir, stream, global_scale=1.0,
                   iteration="after_refine", printer=None):
    """Render every mapped keyframe and aggregate metrics
    (eval_utils.py:78-212 parity, minus mesh — see utils/mesh.py)."""
    lpips_fn = _try_lpips()
    img_dir = os.path.join(save_dir, "rendering", iteration)
    os.makedirs(img_dir, exist_ok=True)

    psnrs, ssims, lpipss, depth_l1s = [], [], [], []
    for kf_idx, frame_idx in zip(mapper.video_idxs, mapper.keyframe_idxs):
        if not mapper.is_kf.get(kf_idx, False):
            continue
        cam = mapper.viewpoints.get(kf_idx, mapper.cameras.get(kf_idx))
        if cam is None:
            continue
        _, gt_color, gt_depth, _ = stream[frame_idx]
        out = mapper.render(cam)
        image = out.color
        if kf_idx != mapper.first_mapped_uid:
            a, b = mapper.exp_ab.get(kf_idx, np.zeros(2))
            image = jnp.exp(a) * image + b
        image = jnp.clip(image, 0.0, 1.0)
        gt = jnp.asarray(gt_color)
        mask = gt > 0
        psnrs.append(float(psnr(image, gt, mask)))
        ssims.append(float(ssim(image, gt)))
        if lpips_fn is not None:
            import torch
            a_t = torch.from_numpy(np.asarray(image).transpose(2, 0, 1))[None]
            b_t = torch.from_numpy(np.asarray(gt).transpose(2, 0, 1))[None]
            lpipss.append(float(lpips_fn(a_t.clamp(0, 1), b_t.clamp(0, 1))))
        if gt_depth is not None:
            d = np.asarray(out.depth) * global_scale
            m = (np.asarray(gt_depth) > 0) & (d > 0)
            if m.sum():
                depth_l1s.append(float(np.abs(
                    d[m] - np.asarray(gt_depth)[m]).mean()))

    result = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else None,
        "mean_ssim": float(np.mean(ssims)) if ssims else None,
        "mean_lpips": float(np.mean(lpipss)) if lpipss else None,
        "mean_depth_l1": float(np.mean(depth_l1s)) if depth_l1s else None,
        "num_frames": len(psnrs),
    }
    with open(os.path.join(save_dir, "rendering", iteration,
                           "final_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    if printer:
        printer.print(f"render eval [{iteration}]: {result}")
    return result
