"""Pallas TPU compositing kernels for the 3DGS rasterizer.

Replaces the XLA chunk-scan compositor (rasterizer._composite_core) on
TPU. Why a hand-written kernel (measured at 12 cams / 65k Gaussians /
320×640 / K=256 on a v5e):

  * the XLA path does T·K·P work ALWAYS (static worst case) — 61 ms fwd,
    ~250 ms bwd — while real tiles average ~10–50 contributors; here the
    per-tile chunk blocks are PREDICATED (`pl.when`) on the actual
    contributor count and on transmittance saturation, so skipped chunks
    cost nothing (the CUDA rasterizer's early termination);
  * the gradient reduction to per-Gaussian rows was a 2.4M-row XLA
    scatter-add (~270 ms, cost ∝ rows regardless of validity), and the
    forward's per-Gaussian n_touched was a second one. The TPU grid
    executes SEQUENTIALLY on the core, so these kernels accumulate into
    per-camera VMEM-resident accumulators with plain read-modify-write —
    no scatter, no atomics. The accumulator IS the revisited output
    block (zeroed at the camera's first tile, written back automatically
    at the camera boundary).

Mosaic constraints shape the implementation:
  * dynamic lane (minor-dim) offsets must be 128-aligned → the chunk
    loop is STATICALLY UNROLLED (chunk starts are constants) and the
    per-entry accumulate uses a lane-mask + full-(rows,128)-tile RMW at
    a dynamic LEADING index: accumulators are (N/128, rows, 128);
  * jnp.cumprod/cumsum have no lowering → unrolled prefix ops;
  * iota must be integer.

Data layouts for the (8,128) f32 tile:
  * tile lists are (B·T, 10, K): fields on sublanes, contributors on
    lanes. Field order: [mean_x, mean_y, conic_a, conic_b, conic_c,
    col_r, col_g, col_b, opacity, depth]. Gaussian ids live ONLY in the
    (B·T, 1, K) SMEM mirror (scalar loads feed both the accumulator
    block index and the per-entry lane mask — a former float id row
    cost a 16th packet row of gather + DMA traffic);
  * per-tile pixel outputs are (B·T, 8, P) with P = 256 = TILE² lanes.

Reference for the math: the diff-gaussian-rasterization-w-pose CUDA
forward/backward; the suffix-sum backward is
  dL/dαᵢ = T_beforeᵢ·sᵢ + (g_A·T_final − Σ_{j>i} wⱼsⱼ)/(1−αᵢ).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE            # pixels per tile (lanes)
# contributors per predicated chunk block (env-tunable for kernel A/B
# sweeps: wider chunks mean fewer predication points / scalar stalls but
# less early-exit granularity). Measured on v5e at 12 cams/65k/K=256
# (mean tile count 83): CH 16→32 cut fwd 42.5→25.0 ms and bwd
# 66.4→41.1 ms — per-chunk fixed costs (predication + scalar stalls)
# dominate at CH=16; CH=8 was 1.9× WORSE than 16. Clamped to K per call.
CH = int(os.environ.get("SPLATSLAM_CH", "32"))
# Transmittance early-termination check cadence, in chunks. The check is
# a vector→scalar max reduction whose scalar-unit stall measured ~45%
# of the whole kernel at CH=32 (fwd 25.0→13.8 ms without it), so it runs
# every SAT_EVERY chunks (first chunk never checks — a tile cannot be
# saturated before any work). Results are IDENTICAL either way: the
# T_MIN weight gate already zeroes contributions behind saturation; the
# check only skips provably-dead work, and a 2-chunk overshoot costs
# less than per-chunk stalls. SPLATSLAM_NO_SATCHECK=1 disables entirely.
SAT_EVERY = int(os.environ.get("SPLATSLAM_SAT_EVERY", "2"))
SAT_CHECK = not os.environ.get("SPLATSLAM_NO_SATCHECK")
LANES = 128
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
MAX_ALPHA = 0.99


def _prefix_prod(x):
    """Inclusive prefix product along axis 0 (no cumprod lowering in
    Pallas TPU). Hillis–Steele log-step scan: log2(CH) full-(CH,P)
    multiplies instead of CH-1 serial (1,P) row ops — fewer, wider VPU
    ops and a 4-deep (not 15-deep) dependency chain."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.ones_like(x[:d])
        x = x * jnp.concatenate([pad, x[:-d]], 0)
        d *= 2
    return x


def _prefix_sum(x):
    """Inclusive prefix sum along axis 0 (log-step scan, see
    _prefix_prod)."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.zeros_like(x[:d])
        x = x + jnp.concatenate([pad, x[:-d]], 0)
        d *= 2
    return x


def _pix_coords(tt, ntx):
    """Pixel centers of camera-tile `tt`: (1,P) x and y."""
    ty = tt // ntx
    tx = tt % ntx
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * TILE + jnp.mod(lane, TILE)).astype(jnp.float32)
    py = (ty * TILE + lane // TILE).astype(jnp.float32)
    return px, py


def _chunk_eval(tl_ref, c0, ch, px, py, count, j=0):
    """Evaluate the static chunk starting at c0: alpha (ch,P) with CUDA
    gating. tl_ref block is (TB, 10, K); c0/ch/j are Python ints."""
    f = tl_ref[j, :, c0:c0 + ch]            # (10, ch) static slice
    # ONE lane->sublane relayout for all 10 fields (the per-field
    # row-to-column reshape costed 10 separate relayout ops)
    fT = f.T                                 # (ch, 10)
    g = lambda r: fT[:, r:r + 1]
    mx, my, ca, cb, cc = g(0), g(1), g(2), g(3), g(4)
    cr, cg, cb_, op, dp = g(5), g(6), g(7), g(8), g(9)
    dx = px - mx                             # (ch,P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_raw = op * jnp.exp(power)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    kidx = (c0 + jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0))
    live = ((power <= 0) & (alpha >= ALPHA_MIN) & (kidx < count))
    alpha = jnp.where(live, alpha, 0.0)
    return (alpha, alpha_raw, power, live, dx, dy,
            (mx, my, ca, cb, cc, cr, cg, cb_, op, dp))


def _entry_mask(ids_ref, j, k, lanes_iota):
    """One-hot (1, LANES) f32 mask for tile-list entry k, built from the
    SMEM ids mirror (scalar load + broadcast compare; the former float
    gid row in the tile lists cost a 16th packet row of gather+DMA
    traffic and a per-chunk vector relayout). Padding entries (id < 0)
    get an all-zero mask, so unconditional RMWs add exact zeros."""
    gid = ids_ref[j, 0, k]
    return ((lanes_iota == jnp.mod(gid, LANES)) & (gid >= 0)
            ).astype(jnp.float32)


def _fwd_kernel(counts_ref, tl_ref, ids_ref, out_ref, ntouch_ref, st_ref,
                *, ntx, n_cam_tiles, K, want_touched, TB):
    b = pl.program_id(0)
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        ntouch_ref[...] = jnp.zeros_like(ntouch_ref)

    ch = min(CH, K)
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # TB tiles per grid step: amortizes grid-iteration + block-DMA fixed
    # costs (the per-tile work is a handful of µs — at B·T ≈ 10⁴ tiles
    # the fixed costs were a measurable slice of the kernel)
    for j in range(TB):
        tt = tb * TB + j
        t = b * n_cam_tiles + tt
        count = jnp.minimum(counts_ref[t], K)
        px, py = _pix_coords(tt, ntx)

        # per-tile state scratch: rows 0-2 color, 3 depth, 4 trans
        st_ref[0:4, :] = jnp.zeros((4, P), jnp.float32)
        st_ref[4:5, :] = jnp.ones((1, P), jnp.float32)

        for ci, c0 in enumerate(range(0, K, ch)):
            pred = (c0 < count)
            if SAT_CHECK and ci > 0 and ci % SAT_EVERY == 0:
                pred &= (jnp.max(st_ref[4:5, :]) >= T_MIN)

            @pl.when(pred)
            def _(c0=c0, j=j):
                trans = st_ref[4:5, :]
                alpha, _, _, _, _, _, f = _chunk_eval(
                    tl_ref, c0, ch, px, py, count, j)
                _, _, _, _, _, cr, cg, cb_, _, dp = f
                cum = _prefix_prod(1.0 - alpha)                 # (ch,P)
                t_before = trans * jnp.concatenate(
                    [jnp.ones_like(cum[:1]), cum[:-1]], 0)
                w = jnp.where(t_before * (1.0 - alpha) < T_MIN,
                              0.0, alpha * t_before)
                st_ref[0:3, :] = st_ref[0:3, :] + jnp.concatenate(
                    [jnp.sum(w * cr, 0, keepdims=True),
                     jnp.sum(w * cg, 0, keepdims=True),
                     jnp.sum(w * cb_, 0, keepdims=True)], 0)
                st_ref[3:4, :] = st_ref[3:4, :] + jnp.sum(
                    w * dp, 0, keepdims=True)
                st_ref[4:5, :] = trans * cum[-1:]

                if want_touched:
                    # per-Gaussian pixels-touched accumulation (replaces
                    # an XLA segment_sum): lane-masked full-tile RMW at a
                    # dynamic LEADING index; the sequential grid makes RMW
                    # race-free. Skipped entirely (static) in the hot
                    # optimization iterations — visibility is only
                    # consumed at segment boundaries (densify/reset
                    # gates).
                    touched = jnp.sum((w > 0), axis=1,
                                      keepdims=True).astype(jnp.float32)
                    for i in range(ch):
                        # accumulator block index from the SMEM ids
                        # mirror: a static scalar load, vs extracting
                        # gid[i, 0] from a vector register (a
                        # vector→scalar move is the hot-loop tax — see
                        # the bwd kernel's accumulate note)
                        blk = jnp.maximum(ids_ref[j, 0, c0 + i],
                                          0) // LANES
                        upd = touched[i:i + 1, :] * _entry_mask(
                            ids_ref, j, c0 + i, lanes_iota)
                        ntouch_ref[0, blk, 0:1, :] = \
                            ntouch_ref[0, blk, 0:1, :] + upd

        out_ref[j, 0:3, :] = st_ref[0:3, :]
        out_ref[j, 3:4, :] = st_ref[3:4, :]
        out_ref[j, 4:5, :] = 1.0 - st_ref[4:5, :]
        out_ref[j, 5:8, :] = jnp.zeros((3, P), jnp.float32)


def _bwd_kernel(counts_ref, tl_ref, ids_ref, gp_ref, fo_ref, acc_ref,
                st_ref, *, ntx, n_cam_tiles, K, TB):
    b = pl.program_id(0)
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for j in range(TB):
        _bwd_tile(counts_ref, tl_ref, ids_ref, gp_ref, fo_ref, acc_ref,
                  st_ref, b=b, tt=tb * TB + j, j=j, ntx=ntx,
                  n_cam_tiles=n_cam_tiles, K=K)


def _bwd_tile(counts_ref, tl_ref, ids_ref, gp_ref, fo_ref, acc_ref,
              st_ref, *, b, tt, j, ntx, n_cam_tiles, K):
    t = b * n_cam_tiles + tt
    count = jnp.minimum(counts_ref[t], K)
    px, py = _pix_coords(tt, ntx)

    g_c0 = gp_ref[j, 0:1, :]
    g_c1 = gp_ref[j, 1:2, :]
    g_c2 = gp_ref[j, 2:3, :]
    g_d = gp_ref[j, 3:4, :]
    g_a = gp_ref[j, 4:5, :]

    # The classical bwd needs (a) the final transmittance and (b) the
    # total per-pixel Σᵢ wᵢsᵢ. Both fall out of the FORWARD's outputs —
    # T_final = 1 − alpha_out and
    #   Σᵢ wᵢsᵢ = Σᵢ wᵢ(cᵢ·g_c + dᵢ·g_d) = color_out·g_c + depth_out·g_d
    # (color_out is pre-background here) — so the former "pass 1" full
    # recompute sweep over all chunks is unnecessary (it was ~40% of the
    # backward kernel's time).
    G = g_a * (1.0 - fo_ref[j, 4:5, :])           # g_A · T_final, (1,P)
    s_tot = (fo_ref[j, 0:1, :] * g_c0 + fo_ref[j, 1:2, :] * g_c1
             + fo_ref[j, 2:3, :] * g_c2 + fo_ref[j, 3:4, :] * g_d)

    # single pass: prefix recompute + per-contributor grads + accumulate
    ch = min(CH, K)
    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    st_ref[4:5, :] = jnp.ones((1, P), jnp.float32)
    st_ref[6:7, :] = jnp.zeros((1, P), jnp.float32)
    for ci, c0 in enumerate(range(0, K, ch)):
        pred = (c0 < count)
        if SAT_CHECK and ci > 0 and ci % SAT_EVERY == 0:
            pred &= (jnp.max(st_ref[4:5, :]) >= T_MIN)

        @pl.when(pred)
        def _(c0=c0):
            trans = st_ref[4:5, :]
            alpha, alpha_raw, power, live, dx, dy, f = _chunk_eval(
                tl_ref, c0, ch, px, py, count, j)
            _, _, ca, cb, cc, cr, cg, cb_, op, dp = f
            cum = _prefix_prod(1.0 - alpha)
            t_before = trans * jnp.concatenate(
                [jnp.ones_like(cum[:1]), cum[:-1]], 0)
            w_live = t_before * (1.0 - alpha) >= T_MIN
            w = jnp.where(w_live, alpha * t_before, 0.0)
            s = cr * g_c0 + cg * g_c1 + cb_ * g_c2 + dp * g_d
            incl = _prefix_sum(w * s)
            s_after = s_tot - (st_ref[6:7, :] + incl)   # Σ_{j>i} wⱼsⱼ
            galpha = jnp.where(w_live & live, t_before * s, 0.0) \
                + jnp.where(live, (G - s_after) / (1.0 - alpha), 0.0)
            unclamped = alpha_raw < MAX_ALPHA
            g_pow = jnp.where(live & unclamped, galpha * alpha_raw, 0.0)
            g_opa = jnp.where(live & unclamped,
                              galpha * jnp.exp(power), 0.0)
            r = lambda x: jnp.sum(x, axis=1, keepdims=True)  # → (ch,1)
            rows = jnp.concatenate([
                r(g_pow * (ca * dx + cb * dy)),       # d/dmean_x
                r(g_pow * (cc * dy + cb * dx)),       # d/dmean_y
                r(g_pow * (-0.5 * dx * dx)),          # d/dconic_a
                r(g_pow * (-dx * dy)),                # d/dconic_b
                r(g_pow * (-0.5 * dy * dy)),          # d/dconic_c
                r(w * g_c0), r(w * g_c1), r(w * g_c2),
                r(g_opa),                             # d/dopacity
                r(w * g_d),                           # d/ddepth
                jnp.zeros((ch, 6), jnp.float32),
            ], axis=1)                                # (ch, 16)
            # per-entry gradient magnitude: all-zero rows add nothing
            # (transmittance underflows to exact 0 behind saturated
            # pixels, so far-back entries skip — CUDA's last_contributor)
            rowsT = rows.T                         # ONE relayout per chunk
            # zero the mask (not the add) for padding entries: dead rows
            # are already all-zero (alpha gating), so an UNCONDITIONAL
            # straight-line RMW is correct — and much faster than a
            # per-entry pl.when, whose branch serializes the
            # vector→scalar gid extraction every iteration (measured
            # ~140 cycles/entry predicated vs ~45 straight-line)
            for i in range(ch):
                # block index via the SMEM ids mirror (static scalar
                # load) instead of gid[i, 0] (vector→scalar move —
                # measured ~2× the whole RMW's cost per entry)
                blk = jnp.maximum(ids_ref[j, 0, c0 + i], 0) // LANES
                upd = rowsT[:, i:i + 1] * _entry_mask(
                    ids_ref, j, c0 + i, lanes_iota)
                acc_ref[0, blk] = acc_ref[0, blk] + upd
            st_ref[4:5, :] = trans * cum[-1:]
            st_ref[6:7, :] = st_ref[6:7, :] + incl[-1:]


def _tiles_per_block(n_cam_tiles: int) -> int:
    """Largest TB in {8,4,2,1} dividing the camera tile count."""
    for tb in (8, 4, 2):
        if n_cam_tiles % tb == 0:
            return tb
    return 1


def composite_fwd_pallas(counts, tl_T, ids, B, n_cam_tiles, ntx, n_rows,
                         interpret=False, want_touched=True):
    """counts (B·T,) int32; tl_T (B·T, 10, K) f32 packet fields;
    ids (B·T, 1, K) int32 — per-camera Gaussian ids (−1 padding) as an
    SMEM mirror (per-entry accumulator block indices and lane masks
    come from cheap scalar loads instead of vector extracts).
    Returns out (B·T, 8, P) [color3, depth, alpha, 0…] and
    n_touched (B, n_rows//128, 8, 128) f32 (row 0 holds the counts;
    a (B, 1, 8, 128) zero dummy when want_touched=False — the per-entry
    accumulation loop is statically skipped)."""
    BT, _, K = tl_T.shape
    NB = n_rows // LANES if want_touched else 1
    TB = _tiles_per_block(n_cam_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_cam_tiles // TB),
        in_specs=[
            pl.BlockSpec((TB, 10, K),
                         lambda b, t, *_: (
                             (b * n_cam_tiles) // TB + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, K),
                         lambda b, t, *_: (
                             (b * n_cam_tiles) // TB + t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 8, P),
                         lambda b, t, *_: (
                             (b * n_cam_tiles) // TB + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 8, LANES), lambda b, t, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
    )

    def kernel(counts_ref, tl_ref, ids_ref, out_ref, ntouch_ref, st_ref):
        _fwd_kernel(counts_ref, tl_ref, ids_ref, out_ref, ntouch_ref,
                    st_ref, ntx=ntx, n_cam_tiles=n_cam_tiles, K=K,
                    want_touched=want_touched, TB=TB)

    out, ntouch = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((BT, 8, P), jnp.float32),
                   jax.ShapeDtypeStruct((B, NB, 8, LANES), jnp.float32)),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(counts, tl_T, ids)
    return out, ntouch


def composite_bwd_pallas(counts, tl_T, ids, gpack, fwdout, B, n_cam_tiles,
                         ntx, n_rows, interpret=False):
    """Gradient accumulation kernel.

    counts (B·T,) int32; tl_T (B·T,10,K) packet fields;
    ids (B·T, 1, K) int32 SMEM mirror of the per-camera ids (see
    composite_fwd_pallas); gpack (B·T, 8, P) rows = [g_color(3),
    g_depth, g_alpha, 0…];
    fwdout (B·T, 8, P) the forward kernel's output rows (pre-background
    color 3, depth, alpha) — supplies T_final and Σwᵢsᵢ without a
    recompute sweep.
    Returns acc (B, n_rows//128, 16, 128): per-camera blocked
    per-Gaussian gradient rows (n_rows multiple of 128).
    """
    BT, _, K = tl_T.shape
    NB = n_rows // LANES
    TB = _tiles_per_block(n_cam_tiles)
    tile_spec = pl.BlockSpec((TB, 8, P),
                             lambda b, t, *_: (
                                 (b * n_cam_tiles) // TB + t, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_cam_tiles // TB),
        in_specs=[
            pl.BlockSpec((TB, 10, K),
                         lambda b, t, *_: (
                             (b * n_cam_tiles) // TB + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, K),
                         lambda b, t, *_: (
                             (b * n_cam_tiles) // TB + t, 0, 0),
                         memory_space=pltpu.SMEM),
            tile_spec,
            tile_spec,
        ],
        out_specs=pl.BlockSpec((1, NB, 16, LANES),
                               lambda b, t, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
    )

    def kernel(counts_ref, tl_ref, ids_ref, gp_ref, fo_ref, acc_ref,
               st_ref):
        _bwd_kernel(counts_ref, tl_ref, ids_ref, gp_ref, fo_ref, acc_ref,
                    st_ref, ntx=ntx, n_cam_tiles=n_cam_tiles, K=K, TB=TB)

    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, NB, 16, LANES), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(counts, tl_T, ids, gpack, fwdout)
    return acc
