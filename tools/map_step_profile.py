#!/usr/bin/env python
"""Decompose map_step wall time into its sub-kernels on the real TPU.

Times, at a given scale (default Replica: B=12 cams, 320x640, K=256,
capacity via --gaussians, half alive):
  project   - vmapped project_gaussians fwd
  bin       - bin_gaussians_batch (argsorts + big sort + searchsorted)
  prep      - _pallas_prep gather into tile-list layout
  pallas_fwd- compositing forward kernel
  pallas_bwd- gradient accumulation kernel
  rast_fwd  - full rasterize_batch forward
  rast_vjp  - rasterize_batch fwd+bwd via jax.vjp
  map_step  - the full fused training step (includes loss, Adam)

Usage: python tools/map_step_profile.py [--json] [--gaussians N]
       [--cams B] [--hw H,W] [--K k]
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


def timeit(fn, *args, n=5, warmup=2, **kw):
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
    ap.add_argument("--gaussians", type=int, default=1 << 17)
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--hw", type=str, default="320,640")
    ap.add_argument("--K", type=int, default=256)
    ap.add_argument("--ssim", action="store_true",
                    help="use_ssim=True in map_step (production map() path)")
    ap.add_argument("--opt-poses", action="store_true",
                    help="opt_poses=True (tau grads + retraction)")
    ap.add_argument("--dense", action="store_true",
                    help="cluster the cloud so tiles run near K contributors "
                         "(real-scene occupancy; default cloud is sparse)")
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    B = args.cams
    K = args.K

    from functools import partial
    from splatslam_tpu.ops import rasterizer as rz
    from splatslam_tpu.ops import raster_pallas as rp
    from splatslam_tpu.mapping import gaussians as G
    from splatslam_tpu.mapping.mapper import map_step

    key = jax.random.PRNGKey(0)
    C = args.gaussians
    st = G.make_state(C)
    n_alive = C // 2
    # --dense: tighter cluster + bigger splats → tiles near K occupancy
    spread = 0.6 if args.dense else 2.0
    size = 0.08 if args.dense else 0.03
    new = dict(xyz=jnp.concatenate(
        [jax.random.normal(key, (n_alive, 2)) * spread,
         2.0 + jax.random.uniform(key, (n_alive, 1)) * 2.0], -1),
        color=jax.random.uniform(key, (n_alive, 3)),
        scales=jnp.log(jnp.full((n_alive, 3), size)),
        valid=jnp.ones(n_alive, bool), count=jnp.asarray(n_alive))
    st = G.insert_points(st, new, 0)
    intr = jnp.asarray([W * 15 / 16.0, W * 15 / 16.0, W / 2.0, H / 2.0])

    ntx = (W + 15) // 16
    nty = (H + 15) // 16
    T = ntx * nty
    w2cs = jnp.tile(jnp.eye(4), (B, 1, 1))

    scal = G.get_scaling(st)
    opac = G.get_opacity(st)[:, 0]
    cols = G.get_colors_dc(st)
    results = {}

    # 1. projection
    proj = jax.jit(jax.vmap(
        rz.project_gaussians,
        in_axes=(None, None, None, 0, None, None, None)),
        static_argnums=(5, 6))
    results["project_ms"] = timeit(
        proj, st.xyz, scal, st.rotation, w2cs, intr, H, W) * 1e3
    means2d, depth_z, conic, radius, in_front = proj(
        st.xyz, scal, st.rotation, w2cs, intr, H, W)
    visible = in_front & st.alive[None]

    # 2. binning
    bin_fn = jax.jit(partial(rz.bin_gaussians_batch, n_tiles_x=ntx,
                             n_tiles_y=nty, K=K))
    results["bin_ms"] = timeit(
        bin_fn, means2d, radius, depth_z, visible) * 1e3
    tile_ids, tile_counts = bin_fn(means2d, radius, depth_z, visible)

    packets = jnp.concatenate([
        means2d, conic, jnp.broadcast_to(cols[None], (B, C, 3)),
        jnp.broadcast_to(opac[None, :, None], (B, C, 1)),
        depth_z[..., None]], -1)

    # 3. prep gather
    prep = jax.jit(rz._pallas_prep)
    results["prep_ms"] = timeit(prep, tile_ids, tile_counts, packets) * 1e3
    tl_T, ids_smem, counts_flat = prep(tile_ids, tile_counts, packets)

    # 4/5. pallas fwd / bwd kernels
    fwd_k = jax.jit(partial(rp.composite_fwd_pallas, B=B, n_cam_tiles=T,
                            ntx=ntx, n_rows=C))
    results["pallas_fwd_ms"] = timeit(fwd_k, counts_flat, tl_T,
                                      ids_smem) * 1e3
    fwd_nt = jax.jit(partial(rp.composite_fwd_pallas, B=B, n_cam_tiles=T,
                             ntx=ntx, n_rows=C, want_touched=False))
    results["pallas_fwd_notouch_ms"] = timeit(fwd_nt, counts_flat,
                                              tl_T, ids_smem) * 1e3
    fout, _ = fwd_k(counts_flat, tl_T, ids_smem)
    gpack = jnp.ones((B * T, 8, 256), jnp.float32) * 1e-3
    bwd_k = jax.jit(partial(rp.composite_bwd_pallas, B=B, n_cam_tiles=T,
                            ntx=ntx, n_rows=C))
    results["pallas_bwd_ms"] = timeit(bwd_k, counts_flat, tl_T, ids_smem,
                                      gpack, fout) * 1e3

    # 6. full forward
    def fwd():
        return rz.rasterize_batch(
            st.xyz, scal, st.rotation, opac, cols, st.alive,
            w2cs, jnp.zeros((B, 6)), intr, jnp.zeros(3), H=H, W=W, K=K)
    results["rast_fwd_ms"] = timeit(fwd) * 1e3

    # 7. fwd+bwd via value_and_grad of a scalar loss
    @jax.jit
    def vjp_step(xyz, scal, rot, opa, col):
        def f(xyz, scal, rot, opa, col):
            out = rz.rasterize_batch(
                xyz, scal, rot, opa, col, st.alive, w2cs,
                jnp.zeros((B, 6)), intr, jnp.zeros(3), H=H, W=W, K=K)
            return jnp.sum(out.color) + jnp.sum(out.depth)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            xyz, scal, rot, opa, col)
    results["rast_vjp_ms"] = timeit(
        vjp_step, st.xyz, scal, st.rotation, opac, cols) * 1e3

    # 8. full map_step
    imgs = jax.random.uniform(key, (B, H, W, 3))
    deps = jnp.full((B, H, W), 2.5)
    expo = jnp.zeros((B, 2))
    lrs = dict(xyz=1e-4, f_dc=0.0025, f_rest=1e-4, opacity=0.05,
               scaling=0.001, rotation=0.001)
    exp_state = (jnp.zeros((B, 2)), jnp.zeros((B, 2)))
    tau_state = (jnp.zeros((B, 6)), jnp.zeros((B, 6)))
    ones_b = jnp.ones((B,), bool)

    use_ssim = args.ssim
    opt_poses = args.opt_poses
    pose_mask = jnp.ones((B,), bool) if opt_poses else jnp.zeros((B,), bool)

    def step():
        return map_step(st, exp_state, tau_state, w2cs, imgs, deps, expo,
                        ones_b, ones_b, pose_mask, intr, lrs,
                        (jnp.asarray(5e-4), jnp.asarray(1.5e-3)),
                        jnp.asarray(1), jnp.asarray(10.0),
                        H=H, W=W, K=K, use_ssim=use_ssim, alpha=0.8,
                        opt_poses=opt_poses)
    results["map_step_ms"] = timeit(step, n=3) * 1e3

    # 9. the hot-loop configuration: prebinned lists + no touch counts
    def step_hot():
        return map_step(st, exp_state, tau_state, w2cs, imgs, deps, expo,
                        ones_b, ones_b, pose_mask, intr, lrs,
                        (jnp.asarray(5e-4), jnp.asarray(1.5e-3)),
                        jnp.asarray(1), jnp.asarray(10.0),
                        tile_ids, tile_counts,
                        H=H, W=W, K=K, use_ssim=use_ssim, alpha=0.8,
                        opt_poses=opt_poses, want_touched=False)
    results["map_step_hot_ms"] = timeit(step_hot, n=3) * 1e3

    # 10. fused loop: amortized per-iteration cost of map_step_n
    from splatslam_tpu.mapping.mapper import map_step_n
    NIT = 16

    def loop16():
        return map_step_n(
            st, exp_state, tau_state, w2cs, imgs, deps, expo,
            ones_b, ones_b, pose_mask, intr, lrs,
            (jnp.asarray(5e-4), jnp.asarray(1.5e-3)),
            jnp.asarray(0), jnp.asarray(NIT), jnp.asarray(10.0),
            H=H, W=W, K=K, use_ssim=use_ssim, alpha=0.8,
            opt_poses=opt_poses)
    results["map_step_n_periter_ms"] = timeit(loop16, n=2) * 1e3 / NIT

    out = {k: round(v, 2) for k, v in results.items()}
    out.update(dict(B=B, H=H, W=W, K=K, capacity=C, alive=n_alive,
                    ssim=use_ssim, opt_poses=opt_poses, dense=args.dense))
    # tile occupancy of this synthetic cloud (how close to the K cap the
    # compositor actually runs — sparse clouds understate real cost)
    cnt = np.asarray(tile_counts)
    out["tile_count_mean"] = round(float(cnt.mean()), 1)
    out["tile_count_p95"] = round(float(np.percentile(cnt, 95)), 1)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:20s} {v}")


if __name__ == "__main__":
    main()
