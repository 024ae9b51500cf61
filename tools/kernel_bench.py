#!/usr/bin/env python
"""Per-kernel TPU timings at Replica-like shapes.

Measures the hot paths from SURVEY.md §3.5 so optimization is
profile-driven:
  * fnet/cnet encoders (320×640 frame)
  * fused factor-graph update kernel (GRU + alt-corr, 96 edges @ 40×80)
  * stage-1 DBA (96 edges, 50-frame window)
  * rasterizer forward and map_step fwd+bwd (window of 12 @ 320×640)

Usage: python tools/kernel_bench.py [--json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion. jax.block_until_ready returns immediately on the
    axon remote backend (measured: an 8192³ matmul 'completed' in 35 µs);
    fetching one element is the only reliable fence."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[:1])


def timeit(fn, *args, n=5, warmup=2, **kw):
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    # n dispatches, one fence: per-call cost includes queue pipelining,
    # minus n-1 fence round trips that aren't the kernel's fault
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--gaussians", type=int, default=1 << 17)
    args = ap.parse_args()

    from splatslam_tpu.models import DroidNet, init_params
    from splatslam_tpu.tracking.factor_graph import _update_kernel
    from splatslam_tpu.tracking.depth_video import (frame_distance_kernel,
                                                    depth_filter_kernel)
    from splatslam_tpu.ops import ba, lie, rasterizer as rz
    from splatslam_tpu.mapping import gaussians as G
    from splatslam_tpu.mapping.mapper import map_step

    H, W = 320, 640
    h, w = 40, 80
    results = {}
    key = jax.random.PRNGKey(0)
    params = init_params(key, H=64, W=96)
    model = DroidNet()

    # encoders
    img = jax.random.uniform(key, (1, H, W, 3))
    feat_fn = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                               method=DroidNet.features))
    results["fnet_320x640_ms"] = timeit(feat_fn, params, img) * 1e3
    ctx_fn = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                              method=DroidNet.context))
    results["cnet_320x640_ms"] = timeit(ctx_fn, params, img) * 1e3

    # tracking state at Replica scale
    P = 64
    N = 96
    poses = lie.exp(jax.random.normal(key, (P, 6)) * 0.05)
    disps = 0.5 + 0.1 * jax.random.uniform(key, (P, h, w))
    intr8 = jnp.asarray([75.0, 75.0, 40.0, 30.0])
    fmaps = (jax.random.normal(key, (P, h, w, 128)) * 0.1).astype(jnp.bfloat16)
    inps = jax.random.normal(key, (P, h, w, 128)) * 0.1
    rng = np.random.RandomState(0)
    ii = rng.randint(0, 50, N).astype(np.int32)
    jj = np.clip(ii + rng.randint(1, 6, N), 0, 49).astype(np.int32)
    net = jnp.zeros((N, h, w, 128))
    target = jnp.zeros((N, h, w, 2))
    uniq, ix = np.unique(ii, return_inverse=True)
    Mk = ((len(uniq) + 7) // 8) * 8

    results["update_kernel_96edges_ms"] = timeit(
        _update_kernel, params, poses, disps, intr8, fmaps, inps, net,
        target, jnp.asarray(ii), jnp.asarray(jj),
        jnp.ones(N, bool), jnp.asarray(ix, jnp.int32), Mk) * 1e3

    plan = ba.make_edge_plan(ii, jj, 1, 50)
    eta = jnp.full((plan.M, h, w), 1e-4)
    target_r = jax.random.uniform(key, (N, h, w, 2)) * 10
    weight = jnp.ones((N, h, w, 2))
    results["dba_96edges_2iter_ms"] = timeit(
        ba.dba, poses, disps, intr8, target_r, weight, eta,
        jnp.zeros_like(disps), plan, iters=2) * 1e3

    results["frame_distance_96_ms"] = timeit(
        frame_distance_kernel, poses, disps, intr8, jnp.asarray(ii),
        jnp.asarray(jj), 0.6) * 1e3

    results["depth_filter_48_ms"] = timeit(
        depth_filter_kernel, poses, disps, intr8,
        jnp.arange(48, dtype=jnp.int32), jnp.full((48,), 0.01)) * 1e3

    # mapping at Replica scale
    C = args.gaussians
    st = G.make_state(C)
    n_alive = C // 2
    new = dict(xyz=jnp.concatenate(
        [jax.random.normal(key, (n_alive, 2)) * 2.0,
         2.0 + jax.random.uniform(key, (n_alive, 1)) * 2.0], -1),
        color=jax.random.uniform(key, (n_alive, 3)),
        scales=jnp.log(jnp.full((n_alive, 3), 0.03)),
        valid=jnp.ones(n_alive, bool), count=jnp.asarray(n_alive))
    st = G.insert_points(st, new, 0)
    intr = jnp.asarray([600.0, 600.0, 320.0, 160.0])

    def fwd():
        return rz.rasterize(
            st.xyz, G.get_scaling(st), st.rotation,
            G.get_opacity(st)[:, 0], G.get_colors_dc(st), st.alive,
            jnp.eye(4), jnp.zeros(6), intr, jnp.zeros(3), H=H, W=W, K=256)

    results[f"rasterize_fwd_{n_alive}g_ms"] = timeit(fwd) * 1e3

    B = 12
    w2cs = jnp.tile(jnp.eye(4), (B, 1, 1))
    imgs = jax.random.uniform(key, (B, H, W, 3))
    deps = jnp.full((B, H, W), 2.5)
    expo = jnp.zeros((B, 2))
    use_exp = jnp.ones((B,), bool)
    cam_valid = jnp.ones((B,), bool)
    lrs = dict(xyz=1e-4, f_dc=0.0025, f_rest=1e-4, opacity=0.05,
               scaling=0.001, rotation=0.001)
    exp_state = (jnp.zeros((B, 2)), jnp.zeros((B, 2)))

    tau_state = (jnp.zeros((B, 6)), jnp.zeros((B, 6)))
    pose_mask = jnp.zeros((B,), bool)
    cam_lrs = (jnp.asarray(5e-4), jnp.asarray(1.5e-3))

    def step():
        return map_step(st, exp_state, tau_state, w2cs, imgs, deps, expo,
                        use_exp, cam_valid, pose_mask, intr, lrs, cam_lrs,
                        jnp.asarray(1), jnp.asarray(10.0),
                        H=H, W=W, K=256, use_ssim=False, alpha=0.8)

    results[f"map_step_12cam_{n_alive}g_ms"] = timeit(step, n=3) * 1e3

    if args.json:
        print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    else:
        for k, v in results.items():
            print(f"{k:42s} {v:10.2f}")


if __name__ == "__main__":
    main()
