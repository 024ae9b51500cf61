"""Evaluation utilities: Umeyama/ATE, TSDF + marching cubes, F-score."""

import numpy as np
import jax.numpy as jnp
import pytest

from splatslam_tpu.utils.eval_traj import umeyama_alignment, ape_stats
from splatslam_tpu.utils import mesh as M


def test_umeyama_recovers_sim3():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 50)
    # ground-truth similarity
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s, t = 1.7, np.asarray([0.4, -1.0, 2.0])
    y = s * R @ x + t[:, None]
    r_e, t_e, s_e = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(r_e, R, atol=1e-6)
    np.testing.assert_allclose(t_e, t, atol=1e-6)
    assert abs(s_e - s) < 1e-6


def test_ape_stats_zero_for_aligned():
    rng = np.random.RandomState(1)
    gt = np.cumsum(rng.randn(30, 3) * 0.1, axis=0)
    est = 0.5 * gt @ np.eye(3) + 1.0  # scaled + shifted copy
    stats, _ = ape_stats(est, gt, correct_scale=True)
    assert stats["rmse"] < 1e-6
    # without scale correction the scaled copy has error
    stats2, _ = ape_stats(est, gt, correct_scale=False)
    assert stats2["rmse"] > 0.01


def test_marching_cubes_sphere():
    n = 40
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    vol = np.sqrt(((g - c) ** 2).sum(0)) - 12.0  # SDF of radius-12 sphere
    verts, faces = M.marching_cubes(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts - c, axis=1)
    np.testing.assert_allclose(r.mean(), 12.0, atol=0.2)
    assert r.std() < 0.3


def test_tsdf_integration_plane():
    H, W = 32, 48
    fx = fy = 40.0
    intr = (fx, fy, W / 2, H / 2)
    depth = np.full((H, W), 2.0, np.float32)
    vol = M.TSDFVolume([-1.5, -1.0, 1.5], [1.5, 1.0, 2.5], voxel=0.05,
                       trunc=0.15)
    vol.integrate(depth, np.ones((H, W, 3)) * 0.5, np.eye(4), intr)
    verts, faces = vol.extract_mesh()
    assert len(verts) > 50
    np.testing.assert_allclose(verts[:, 2].mean(), 2.0, atol=0.08)


def test_fscore_sensitivity():
    rng = np.random.RandomState(2)
    verts = rng.rand(500, 3).astype(np.float32)
    faces = np.zeros((0, 3), int)
    same = M.run_evaluation(verts, faces, verts, faces, icp=False,
                            n_samples=500)
    assert same["fscore"] > 0.99
    far = M.run_evaluation(verts + 1.0, faces, verts, faces, icp=False,
                           n_samples=500)
    assert far["fscore"] < 0.2


def test_mesh_ply_roundtrip(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]])
    p = str(tmp_path / "m.ply")
    M.save_mesh_ply(p, verts, faces)
    v, f = M.load_mesh_ply(p)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, faces)
