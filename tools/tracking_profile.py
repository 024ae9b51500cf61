#!/usr/bin/env python
"""Decompose the tracking hot path into kernel costs on the real TPU.

Times, at smoke scale by default (48 edges, 1/8-res 30x40, buffer 64):
  fnet / cnet       - encoders on one 240x320 frame
  alt_corr          - volume-per-chunk correlation lookup, 4 levels
  update_step       - corr/flow encoders + ConvGRU + heads (N edges)
  update_agg        - GraphAgg eta/upmask
  dba_2iter         - stage-1 DBA, 2 GN iterations
  fused_round       - ONE round of the production _fused_rounds program
                      (reproject + corr + GRU + BA) amortized from R rounds
  upsample          - convex disparity upsampling

Usage: python tools/tracking_profile.py [--json] [--edges N] [--hw H,W]
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--edges", type=int, default=48)
    ap.add_argument("--hw", type=str, default="240,320")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    h, w = H // 8, W // 8
    N = args.edges
    M = args.frames

    from functools import partial
    from splatslam_tpu.models.droid_net import (DroidNet, compute_dtype,
                                                normalize_images)
    from splatslam_tpu.models.weights import init_params
    from splatslam_tpu.ops import corr as corr_ops
    from splatslam_tpu.ops import projective as pops
    from splatslam_tpu.ops import lie
    from splatslam_tpu.ops.ba import make_edge_plan, dba
    from splatslam_tpu.ops.upsample import upsample_disp

    key = jax.random.PRNGKey(0)
    params = init_params(key, H=H, W=W)
    model = DroidNet(dtype=compute_dtype())
    results = {}

    img = jax.random.uniform(key, (1, H, W, 3))
    feat = jax.jit(lambda p, x: model.apply(
        {"params": p}, normalize_images(x), method=DroidNet.features))
    ctx = jax.jit(lambda p, x: model.apply(
        {"params": p}, normalize_images(x), method=DroidNet.context))
    results["fnet_ms"] = timeit(feat, params, img) * 1e3
    results["cnet_ms"] = timeit(ctx, params, img) * 1e3

    fmaps = jax.random.normal(key, (M, h, w, 128), jnp.float32)
    rng = np.random.RandomState(0)
    ii = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    jj = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    coords = jnp.tile(pops.coords_grid(h, w)[None], (N, 1, 1, 1))

    pyr_fn = jax.jit(partial(corr_ops.build_fmap_pyramid, num_levels=4))
    pyr = pyr_fn(fmaps)
    corr_fn = jax.jit(corr_ops.alt_corr)
    results["alt_corr_ms"] = timeit(corr_fn, pyr, ii, jj, coords) * 1e3
    corr = corr_fn(pyr, ii, jj, coords)

    dt = compute_dtype()
    net = jnp.zeros((N, h, w, 128), dt)
    inp = jnp.zeros((N, h, w, 128), dt)
    flow = jnp.zeros((N, h, w, 4), dt)
    upd = jax.jit(lambda p, n, i, c, f: model.apply(
        {"params": p}, n, i, c.astype(dt), f,
        method=DroidNet.update_step))
    results["update_step_ms"] = timeit(upd, params, net, inp, corr,
                                       flow) * 1e3

    uniq, inv = np.unique(np.asarray(ii), return_inverse=True)
    ix = jnp.asarray(inv.astype(np.int32))
    agg = jax.jit(lambda p, n: model.apply(
        {"params": p}, n, ix, len(uniq), method=DroidNet.update_agg))
    results["update_agg_ms"] = timeit(agg, params, net) * 1e3

    # DBA at the same scale
    poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (M, 1))
    disps = jnp.ones((M, h, w))
    intr8 = jnp.asarray([40.0, 40.0, w / 2, h / 2])
    target = jnp.tile(pops.coords_grid(h, w)[None], (N, 1, 1, 1))
    weight = jnp.ones((N, h, w, 2))
    plan = make_edge_plan(np.asarray(ii), np.asarray(jj), t0=1, t1=M)
    eta = jnp.full((plan.M, h, w), 1e-3)
    sens = jnp.zeros_like(disps)
    dba_fn = partial(dba, iters=2)
    results["dba_2iter_ms"] = timeit(
        dba_fn, poses, disps, intr8, target, weight, eta, sens, plan) * 1e3

    # convex upsampling
    upmask = jnp.zeros((4, h, w, 576))
    d4 = jnp.ones((4, h, w))
    results["upsample_ms"] = timeit(
        jax.jit(upsample_disp), d4, upmask) * 1e3

    # NOTE: the production fused program (_fused_rounds) needs the full
    # video/pool state to call — time it in situ via the phase timers
    # instead: run the smoke with SPLATSLAM_SYNC_TIMERS=1 and read
    # `fe.rounds` (calls × mean_ms). The pieces it fuses are timed
    # above (update kernel, dba) and in tools/kernel_bench.py.
    out = {k: round(v, 2) for k, v in results.items()}
    out.update(dict(edges=N, h=h, w=w, frames=M))
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:18s} {v}")


if __name__ == "__main__":
    main()
