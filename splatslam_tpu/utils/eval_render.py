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


def eval_mesh(mapper, save_dir, traj_aligned=None, global_scale=1.0,
              gt_mesh_path="", printer=None, voxel=5.0 / 512, trunc=0.04):
    """TSDF-fuse rendered keyframe depths → mesh (+ optional F-score vs a
    ground-truth mesh) — eval_utils.py:70-73,137-187 parity."""
    from .mesh import TSDFVolume, save_mesh_ply, load_mesh_ply, run_evaluation

    cams = [(k, mapper.viewpoints.get(k, mapper.cameras.get(k)))
            for k in mapper.video_idxs if mapper.is_kf.get(k, False)]
    cams = [(k, c) for k, c in cams if c is not None]
    if not cams:
        return None
    # scene bounds from camera centers + proxy depth range
    centers = np.stack([np.linalg.inv(np.asarray(c.w2c))[:3, 3]
                        for _, c in cams])
    depths_max = max(float(np.max(c.depth)) if c.depth is not None else 3.0
                     for _, c in cams)
    lo = centers.min(0) - depths_max
    hi = centers.max(0) + depths_max
    vol = TSDFVolume(lo, hi, voxel=voxel * max(global_scale, 1e-6),
                     trunc=trunc * max(global_scale, 1e-6), max_dim=256)
    intr = np.asarray(mapper.intrinsics)
    for k, cam in cams:
        out = mapper.render(cam)
        d = np.asarray(out.depth)
        a = np.asarray(out.alpha)
        d = np.where(a > 0.5, d / np.clip(a, 1e-6, None), 0.0)
        vol.integrate(d, np.asarray(np.clip(out.color, 0, 1)),
                      np.asarray(cam.w2c), intr)
    verts, faces = vol.extract_mesh()
    os.makedirs(save_dir, exist_ok=True)
    save_mesh_ply(os.path.join(save_dir, "mesh.ply"), verts, faces)
    result = {"n_verts": int(len(verts)), "n_faces": int(len(faces))}
    if gt_mesh_path and os.path.exists(gt_mesh_path):
        gt_v, gt_f = load_mesh_ply(gt_mesh_path)
        if global_scale != 1.0:
            verts = verts * global_scale
        stats = run_evaluation(verts, faces, gt_v, gt_f,
                               distance_thresh=0.05, icp=True)
        result.update(stats)
    if printer:
        printer.print(f"mesh eval: {result}")
    return result


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
