"""Real-format dataset fixtures: write tiny Replica / ScanNet / TUM
scenes to tmp from the Synthetic renderer, then run the FULL run.py path
on each (VERDICT r2 item 6 — the loaders had unit tests but had never
parsed a real on-disk layout).

Layouts mirror src/utils/datasets.py:219-385:
  Replica  results/frame%06d.jpg + results/depth%06d.png + traj.txt
  ScanNet  color/%d.jpg + depth/%d.png + pose/%d.txt
  TUM      rgb.txt / depth.txt / groundtruth.txt (quaternion poses,
           jittered timestamps needing association) + distortion
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from splatslam_tpu.config import load_config
from splatslam_tpu.datasets import Synthetic, get_dataset

N_FRAMES = 10
H, W = 96, 128
FX = FY = 80.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def _cam_cfg():
    return dict(H=H, W=W, fx=FX, fy=FY, cx=CX, cy=CY,
                H_out=H, W_out=W, H_edge=0, W_edge=0,
                png_depth_scale=1000.0)


def _source_frames():
    cfg = {"dataset": "synthetic", "cam": _cam_cfg(),
           "synthetic": {"n_frames": N_FRAMES, "seed": 3,
                         "motion_scale": 5.0}}
    ds = Synthetic(cfg)
    frames = [ds[i] for i in range(N_FRAMES)]
    return frames  # (idx, color f32 [0,1], depth f32 m, c2w)


def _write_img(path, color):
    bgr = (np.clip(color, 0, 1) * 255).astype(np.uint8)[..., ::-1]
    cv2.imwrite(path, bgr, [cv2.IMWRITE_JPEG_QUALITY, 97])


def _write_depth16(path, depth, scale):
    cv2.imwrite(path, np.round(depth * scale).astype(np.uint16))


def make_replica_scene(root, frames):
    os.makedirs(os.path.join(root, "results"), exist_ok=True)
    lines = []
    for i, (_, color, depth, c2w) in enumerate(frames):
        _write_img(os.path.join(root, "results", f"frame{i:06d}.jpg"),
                   color)
        _write_depth16(os.path.join(root, "results", f"depth{i:06d}.png"),
                       depth, 1000.0)
        lines.append(" ".join(f"{v:.9f}" for v in c2w.reshape(-1)))
    with open(os.path.join(root, "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def make_scannet_scene(root, frames):
    for d in ("color", "depth", "pose"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    for i, (_, color, depth, c2w) in enumerate(frames):
        _write_img(os.path.join(root, "color", f"{i}.jpg"), color)
        _write_depth16(os.path.join(root, "depth", f"{i}.png"),
                       depth, 1000.0)
        with open(os.path.join(root, "pose", f"{i}.txt"), "w") as f:
            for row in np.asarray(c2w):
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")


def make_tum_scene(root, frames):
    from scipy.spatial.transform import Rotation
    for d in ("rgb", "depth"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    rgb_l, dep_l, gt_l = [], [], []
    rng = np.random.RandomState(5)
    for i, (_, color, depth, c2w) in enumerate(frames):
        # jittered, non-identical timestamps: rgb/depth/pose streams must
        # be ASSOCIATED by nearest time (datasets.py:200-209)
        t = 1000.0 + i * 0.2
        t_rgb = t + rng.uniform(-0.01, 0.01)
        t_dep = t + rng.uniform(-0.01, 0.01)
        t_pose = t + rng.uniform(-0.01, 0.01)
        _write_img(os.path.join(root, "rgb", f"{t_rgb:.6f}.jpg"), color)
        _write_depth16(os.path.join(root, "depth", f"{t_dep:.6f}.png"),
                       depth, 5000.0)
        rgb_l.append(f"{t_rgb:.6f} rgb/{t_rgb:.6f}.jpg")
        dep_l.append(f"{t_dep:.6f} depth/{t_dep:.6f}.png")
        q = Rotation.from_matrix(np.asarray(c2w)[:3, :3]).as_quat()
        tx, ty, tz = np.asarray(c2w)[:3, 3]
        gt_l.append(f"{t_pose:.6f} {tx:.9f} {ty:.9f} {tz:.9f} "
                    f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_l) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("\n".join(dep_l) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        f.write("\n".join(gt_l) + "\n")


def _slam_cfg(dataset, scene_dir, out_dir):
    cfg = load_config("configs/Synthetic/smoke_oracle.yaml",
                      "configs/splat_slam.yaml")
    cfg["dataset"] = dataset
    cfg["scene"] = f"fixture_{dataset}"
    cfg["verbose"] = False
    cfg["max_frames"] = N_FRAMES
    cfg["cam"] = dict(cfg["cam"], **_cam_cfg())
    cfg["data"] = {"dataset_root": scene_dir, "input_folder": "",
                   "output": out_dir}
    cfg["mono_prior"]["provider"] = "oracle"
    cfg["tracking"]["buffer"] = 16
    cfg["tracking"]["warmup"] = 4
    cfg["tracking"]["motion_filter"]["thresh"] = 0.2
    cfg["tracking"]["frontend"]["keyframe_thresh"] = 0.1
    cfg["mapping"]["capacity"] = 8192
    cfg["mapping"]["raster_K"] = 64
    cfg["mapping"]["final_refine_iters"] = 8
    cfg["mapping"]["Training"]["init_itr_num"] = 16
    cfg["mapping"]["Training"]["mapping_itr_num"] = 8
    cfg["meshing"]["mesh"] = False
    cfg["eval_full_traj"] = False
    cfg["eval_plots"] = False
    return cfg


def _run_slam(cfg):
    from splatslam_tpu.slam import SLAM
    slam = SLAM(cfg)
    ate = slam.run()
    assert os.path.exists(os.path.join(slam.save_dir, "video.npz"))
    assert ate is not None and np.isfinite(ate["rmse"])
    # oracle tracking on GT-rendered frames: the trajectory must be
    # recovered to well under a voxel (quantization of the 16-bit depth
    # pngs + jpeg texture noise dominate)
    assert ate["rmse"] < 0.05, ate
    return ate


@pytest.mark.parametrize("fmt", ["replica", "scannet", "tumrgbd"])
def test_loader_parses_real_layout(fmt, tmp_path):
    """Loader-level check: each format round-trips pose + depth + color
    through its real on-disk layout."""
    frames = _source_frames()
    scene = str(tmp_path / fmt)
    if fmt == "replica":
        make_replica_scene(scene, frames)
    elif fmt == "scannet":
        make_scannet_scene(scene, frames)
    else:
        make_tum_scene(scene, frames)
    cfg = {"dataset": fmt, "cam": _cam_cfg(), "max_frames": N_FRAMES,
           "data": {"dataset_root": scene, "input_folder": ""}}
    if fmt == "tumrgbd":
        cfg["cam"]["png_depth_scale"] = 5000.0
    ds = get_dataset(cfg)
    assert len(ds) == N_FRAMES
    idx, color, depth, pose = ds[3]
    assert color.shape == (H, W, 3) and depth.shape == (H, W)
    assert np.isfinite(pose).all()
    # color within jpeg tolerance (the synthetic texture is
    # high-frequency, which jpeg smooths), depth within png quantization
    src = frames[3]
    assert np.abs(color - src[1]).mean() < 0.08
    assert np.abs(depth - src[2]).mean() < 0.005
    # TUM normalizes to the first pose (datasets.py:240-244)
    if fmt == "tumrgbd":
        want = np.linalg.inv(np.asarray(frames[0][3], np.float64)) @ \
            np.asarray(src[3], np.float64)
    else:
        want = src[3]
    np.testing.assert_allclose(np.asarray(pose, np.float64), want,
                               atol=1e-5)


def test_replica_fixture_e2e(tmp_path):
    frames = _source_frames()
    scene = str(tmp_path / "replica_scene")
    make_replica_scene(scene, frames)
    _run_slam(_slam_cfg("replica", scene, str(tmp_path / "out")))


def test_scannet_fixture_e2e(tmp_path):
    frames = _source_frames()
    scene = str(tmp_path / "scannet_scene")
    make_scannet_scene(scene, frames)
    _run_slam(_slam_cfg("scannet", scene, str(tmp_path / "out")))


def test_tum_fixture_e2e(tmp_path):
    frames = _source_frames()
    scene = str(tmp_path / "tum_scene")
    make_tum_scene(scene, frames)
    cfg = _slam_cfg("tumrgbd", scene, str(tmp_path / "out"))
    cfg["cam"]["png_depth_scale"] = 5000.0
    _run_slam(cfg)
