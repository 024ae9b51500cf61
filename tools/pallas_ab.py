#!/usr/bin/env python
"""Minimal A/B timer for the two Pallas compositing kernels.

Knobs come from env (read by ops/raster_pallas at import):
  SPLATSLAM_CH=16|32|64      chunk width
  SPLATSLAM_NO_SATCHECK=1    drop the per-chunk transmittance early-exit

Usage: SPLATSLAM_CH=32 python tools/pallas_ab.py [--gaussians N]
       [--cams B] [--hw H,W] [--K k] [--json]
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
    ap.add_argument("--gaussians", type=int, default=1 << 16)
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--hw", type=str, default="240,320")
    ap.add_argument("--K", type=int, default=128)
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    B, K, C = args.cams, args.K, args.gaussians

    from functools import partial
    from splatslam_tpu.ops import rasterizer as rz
    from splatslam_tpu.ops import raster_pallas as rp
    from splatslam_tpu.mapping import gaussians as G

    key = jax.random.PRNGKey(0)
    st = G.make_state(C)
    n_alive = C // 2
    new = dict(xyz=jnp.concatenate(
        [jax.random.normal(key, (n_alive, 2)) * 2.0,
         2.0 + jax.random.uniform(key, (n_alive, 1)) * 2.0], -1),
        color=jax.random.uniform(key, (n_alive, 3)),
        scales=jnp.log(jnp.full((n_alive, 3), 0.03)),
        valid=jnp.ones(n_alive, bool), count=jnp.asarray(n_alive))
    st = G.insert_points(st, new, 0)
    intr = jnp.asarray([W * 15 / 16.0, W * 15 / 16.0, W / 2.0, H / 2.0])
    ntx, nty = (W + 15) // 16, (H + 15) // 16
    T = ntx * nty
    w2cs = jnp.tile(jnp.eye(4), (B, 1, 1))
    scal, opac = G.get_scaling(st), G.get_opacity(st)[:, 0]
    cols = G.get_colors_dc(st)

    proj = jax.jit(jax.vmap(
        rz.project_gaussians,
        in_axes=(None, None, None, 0, None, None, None)),
        static_argnums=(5, 6))
    means2d, depth_z, conic, radius, in_front = proj(
        st.xyz, scal, st.rotation, w2cs, intr, H, W)
    visible = in_front & st.alive[None]
    bin_fn = jax.jit(partial(rz.bin_gaussians_batch, n_tiles_x=ntx,
                             n_tiles_y=nty, K=K))
    tile_ids, tile_counts = bin_fn(means2d, radius, depth_z, visible)
    packets = jnp.concatenate([
        means2d, conic, jnp.broadcast_to(cols[None], (B, C, 3)),
        jnp.broadcast_to(opac[None, :, None], (B, C, 1)),
        depth_z[..., None]], -1)
    prep = jax.jit(rz._pallas_prep)
    tl_T, ids_smem, counts_flat = prep(tile_ids, tile_counts, packets)

    res = {"CH": rp.CH, "sat": rp.SAT_CHECK,
           "mean_count": float(jnp.mean(tile_counts)),
           "p95_count": float(jnp.percentile(tile_counts, 95))}
    fwd_nt = jax.jit(partial(rp.composite_fwd_pallas, B=B, n_cam_tiles=T,
                             ntx=ntx, n_rows=C, want_touched=False))
    res["fwd_notouch_ms"] = timeit(fwd_nt, counts_flat, tl_T,
                                   ids_smem) * 1e3
    fwd_k = jax.jit(partial(rp.composite_fwd_pallas, B=B, n_cam_tiles=T,
                            ntx=ntx, n_rows=C))
    res["fwd_touch_ms"] = timeit(fwd_k, counts_flat, tl_T, ids_smem) * 1e3
    fout, _ = fwd_k(counts_flat, tl_T, ids_smem)
    gpack = jnp.ones((B * T, 8, 256), jnp.float32) * 1e-3
    bwd_k = jax.jit(partial(rp.composite_bwd_pallas, B=B, n_cam_tiles=T,
                            ntx=ntx, n_rows=C))
    res["bwd_ms"] = timeit(bwd_k, counts_flat, tl_T, ids_smem,
                           gpack, fout) * 1e3
    out = {k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
