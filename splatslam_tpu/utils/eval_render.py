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
import jax
import jax.numpy as jnp

from ..mapping.losses import psnr, ssim


@jax.jit
def _exposure_and_metrics(color, expo, gts):
    """Exposure correction + per-frame PSNR/SSIM in ONE program (eagerly
    ~15 dispatches per eval chunk)."""
    images = jnp.clip(
        jnp.exp(expo[:, 0, None, None, None]) * color
        + expo[:, 1, None, None, None], 0.0, 1.0)
    ps = jax.vmap(lambda im, gt: psnr(im, gt, gt > 0))(images, gts)
    ss = jax.vmap(ssim)(images, gts)
    return images, jnp.stack([ps, ss])


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
    from .mesh import (TSDFVolume, save_mesh_ply, load_mesh_ply,
                       run_evaluation, clean_mesh)

    mapper._drain_pack()   # camera poses may ride a deferred pull
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
    # voxel/trunc are PHYSICAL meters; the map lives in estimate units
    # where 1 est-unit = global_scale meters → divide (multiplying gave
    # a scale²-too-coarse grid after verts are re-scaled below)
    s = max(global_scale, 1e-6)
    vol = TSDFVolume(lo, hi, voxel=voxel / s, trunc=trunc / s, max_dim=256)
    intr = np.asarray(mapper.intrinsics)
    CH = 8
    for c0 in range(0, len(cams), CH):
        chunk = cams[c0:c0 + CH]
        out = mapper.render_batch([c for _, c in chunk])
        # one pull per chunk (color+depth+alpha concatenated)
        d_np = np.asarray(out.depth)
        a_np = np.asarray(out.alpha)
        c_np = np.asarray(jnp.clip(out.color, 0, 1))
        for i, (k, cam) in enumerate(chunk):
            d = np.where(a_np[i] > 0.5,
                         d_np[i] / np.clip(a_np[i], 1e-6, None), 0.0)
            vol.integrate(d, c_np[i], np.asarray(cam.w2c), intr)
    verts, faces = vol.extract_mesh()
    n0 = len(verts)
    verts, faces, _ = clean_mesh(verts, faces)   # eval_utils.py:331-378
    os.makedirs(save_dir, exist_ok=True)
    save_mesh_ply(os.path.join(save_dir, "mesh.ply"), verts, faces)
    result = {"n_verts": int(len(verts)), "n_faces": int(len(faces)),
              "n_verts_raw": int(n0)}
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


def plot_rgbd_panel(gt, pred, gt_depth, pred_depth, psnr_score, depth_l1,
                    path):
    """2×3 RGB/depth/diff panel per keyframe (reference
    eval_utils.py:130-168 plot_rgbd_silhouette)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(2, 3, figsize=(12, 6))
    diff_rgb = np.abs(gt - pred).mean(-1)
    diff_d = np.abs(gt_depth - pred_depth) * (gt_depth > 0)
    for a, (im, title, kw) in zip(ax.flat, [
            (gt, "GT rgb", {}),
            (pred, f"render (psnr {psnr_score:.2f})", {}),
            (diff_rgb, "|rgb diff|", dict(cmap="jet")),
            (gt_depth, "GT depth", dict(cmap="jet")),
            (pred_depth, "render depth", dict(cmap="jet")),
            (diff_d, f"|depth diff| (L1 {depth_l1:.3f})",
             dict(cmap="jet"))]):
        a.imshow(im, **kw)
        a.set_title(title)
        a.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def _write_gif(frames, path):
    """Animated gif of the rendered keyframes (eval_utils gif output)."""
    try:
        from PIL import Image
        ims = [Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
               for f in frames]
        if ims:
            ims[0].save(path, save_all=True, append_images=ims[1:],
                        duration=120, loop=0)
    except Exception:
        pass


def eval_rendering(mapper, save_dir, stream, global_scale=1.0,
                   iteration="after_refine", printer=None,
                   save_panels=True):
    """Render every mapped keyframe and aggregate metrics
    (eval_utils.py:78-212 parity, minus mesh — see utils/mesh.py).
    save_panels also writes a per-keyframe 2×3 RGB/depth/diff PNG and an
    animated gif of the renders."""
    mapper._drain_pack()   # exp_ab / camera poses may ride a deferred pull
    lpips_fn = _try_lpips()
    img_dir = os.path.join(save_dir, "rendering", iteration)
    os.makedirs(img_dir, exist_ok=True)
    plot_dir = os.path.join(save_dir, f"plots_{iteration}")
    if save_panels:
        os.makedirs(plot_dir, exist_ok=True)

    kfs = [(k, f) for k, f in zip(mapper.video_idxs, mapper.keyframe_idxs)
           if mapper.is_kf.get(k, False)
           and (mapper.viewpoints.get(k, mapper.cameras.get(k)) is not None)]

    psnrs, ssims, lpipss, depth_l1s = [], [], [], []
    gif_frames = []
    # chunked batch rendering: one device program + one scalar pull per
    # chunk instead of a render dispatch + several fetches per keyframe
    CH = 8
    for c0 in range(0, len(kfs), CH):
        chunk = kfs[c0:c0 + CH]
        cams = [mapper.viewpoints.get(k, mapper.cameras.get(k))
                for k, _ in chunk]
        gts = [stream[f] for _, f in chunk]
        out = mapper.render_batch(cams)
        expo = np.asarray([
            mapper.exp_ab.get(k, np.zeros(2))
            if k != mapper.first_mapped_uid else np.zeros(2)
            for k, _ in chunk], np.float32)
        gt_stack = jnp.asarray(np.stack([np.asarray(g[1]) for g in gts]))
        images, scalars_dev = _exposure_and_metrics(
            out.color, jnp.asarray(expo), gt_stack)
        scalars = np.asarray(scalars_dev)             # ONE pull
        psnrs.extend(scalars[0].tolist())
        ssims.extend(scalars[1].tolist())

        need_host_images = save_panels or lpips_fn is not None
        img_np = np.asarray(images) if need_host_images else None
        # alpha-normalized rendered depth (consistent with eval_mesh):
        # the raw accumulation sum(w_i d_i) understates depth wherever
        # coverage alpha < 1. f16 transfers: half the bulk bytes over
        # the ~70 ms/MB link, error ~5e-4 relative — noise at L1 scale.
        a_np = np.asarray(out.alpha.astype(jnp.float16)).astype(
            np.float32)
        dep_np = np.where(
            a_np > 0.5,
            np.asarray(out.depth.astype(jnp.float16)).astype(np.float32)
            / np.clip(a_np, 1e-6, None),
            0.0) * global_scale

        for i, (kf_idx, frame_idx) in enumerate(chunk):
            gt_color, gt_depth = gts[i][1], gts[i][2]
            if lpips_fn is not None:
                import torch
                a_t = torch.from_numpy(
                    img_np[i].transpose(2, 0, 1))[None]
                b_t = torch.from_numpy(np.asarray(
                    gt_color, np.float32).transpose(2, 0, 1))[None]
                lpipss.append(float(lpips_fn(a_t.clamp(0, 1),
                                             b_t.clamp(0, 1))))
            d_l1 = float("nan")
            if gt_depth is not None:
                d = dep_np[i]
                m = (np.asarray(gt_depth) > 0) & (d > 0)
                if m.sum():
                    d_l1 = float(np.abs(d[m] - np.asarray(gt_depth)[m])
                                 .mean())
                    depth_l1s.append(d_l1)
            if save_panels:
                gtd = (np.asarray(gt_depth) if gt_depth is not None
                       else np.zeros(dep_np[i].shape))
                plot_rgbd_panel(
                    np.asarray(gt_color), img_np[i], gtd, dep_np[i],
                    scalars[0][i], 0.0 if np.isnan(d_l1) else d_l1,
                    os.path.join(
                        plot_dir,
                        f"video_idx_{kf_idx}_kf_idx_{frame_idx}.png"))
                gif_frames.append(img_np[i])

    if save_panels and gif_frames:
        _write_gif(gif_frames, os.path.join(plot_dir, "renders.gif"))

    result = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else None,
        "mean_ssim": float(np.mean(ssims)) if ssims else None,
        # numeric-or-None so downstream aggregators never see a string
        "mean_lpips": float(np.mean(lpipss)) if lpipss else None,
        "mean_depth_l1": float(np.mean(depth_l1s)) if depth_l1s else None,
        "num_frames": len(psnrs),
    }
    if not lpipss:
        result["lpips_note"] = ("unavailable (no pretrained AlexNet "
                                "weights in this environment)")
    with open(os.path.join(save_dir, "rendering", iteration,
                           "final_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    if printer:
        printer.print(f"render eval [{iteration}]: {result}")
    return result
