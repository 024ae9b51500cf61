"""Differentiable 3D Gaussian Splatting rasterizer, TPU-native.

Replaces the reference's CUDA `diff-gaussian-rasterization-w-pose`
submodule (API surface documented at
thirdparty/gaussian_splatting/gaussian_renderer/__init__.py:24-153):
projection, EWA 2D covariance, tile binning, per-tile front-to-back
alpha compositing, and the side outputs the SLAM mapper needs
(radii, per-Gaussian touch counts, accumulated opacity, expected depth).

TPU-first design decisions:
  * Static shapes everywhere: the Gaussian set is padded (alive mask),
    tiles are a fixed 16×16 grid, and each tile keeps at most K
    depth-ordered contributors (K is a quality knob; overflow beyond K is
    dropped exactly like hitting the CUDA implementation's shared-memory
    batch limit late in the list — far-behind-everything Gaussians).
  * Binning = one global depth argsort (XLA sort) + a chunked scatter
    compaction into per-tile lists — no dynamic duplicate-and-sort key
    buffers as in CUDA.
  * Compositing is a lax.scan over K-chunks with a carried transmittance;
    the whole forward is plain JAX, so the backward pass — including the
    camera-pose gradients the reference implements by hand in CUDA
    (`theta`/`rho`) — comes from autodiff of the same code. jax.checkpoint
    on the chunk body keeps backward memory at one-chunk residuals.
  * The per-pixel Gaussian evaluation is an outer product of
    (tile pixels × chunk Gaussians) — dense VPU work in VMEM-sized blocks.

Gradient surface matches the CUDA rasterizer: means3D, scales, rotations,
opacities, colors, and the pose delta tau; plus d(loss)/d(means2D) for
densification statistics via an explicit zero-valued `means2d_dummy`
input (the torch `screenspace_points` trick, gaussian_renderer:43-48).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from . import lie

TILE = 16
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
MAX_ALPHA = 0.99


# ---------------------------------------------------------------------------
# projection + EWA splatting
# ---------------------------------------------------------------------------

def project_gaussians(means3D, scales, rotations, w2c, intrinsics, H, W,
                      near=0.01):
    """Project Gaussians: returns (means2d, depth, conic, radius, in_front).

    w2c (4,4); intrinsics (fx,fy,cx,cy). conic is the upper triangle
    (a, b, c) of the inverse 2D covariance.

    Structure-of-arrays math: everything is (N,)-component products. The
    matrix form ((N,3,3)/(N,2,3) batched matmuls) pads the 3-wide minor
    dims to 128-lane TPU tiles — ~40× the memory traffic and tiny
    MXU-hostile matmuls; this form measured 6× faster on the v5e.
    """
    fx, fy, cx, cy = intrinsics
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    m0, m1, m2 = means3D[:, 0], means3D[:, 1], means3D[:, 2]
    x = R[0, 0] * m0 + R[0, 1] * m1 + R[0, 2] * m2 + t[0]
    y = R[1, 0] * m0 + R[1, 1] * m1 + R[1, 2] * m2 + t[1]
    z = R[2, 0] * m0 + R[2, 1] * m1 + R[2, 2] * m2 + t[2]
    in_front = z > near
    zc = jnp.where(in_front, z, 1.0)

    u = fx * x / zc + cx
    v = fy * y / zc + cy
    means2d = jnp.stack([u, v], -1)

    # EWA: limit x/z, y/z like the CUDA kernel (1.3× tan fov bounds)
    lim_x = 1.3 * (0.5 * W / fx)
    lim_y = 1.3 * (0.5 * H / fy)
    txz = jnp.clip(x / zc, -lim_x, lim_x)
    tyz = jnp.clip(y / zc, -lim_y, lim_y)

    # rows of A = J @ R_cam, J the 2×3 perspective Jacobian — components
    j00 = fx / zc
    j02 = -fx * txz / zc
    j11 = fy / zc
    j12 = -fy * tyz / zc
    a00 = j00 * R[0, 0] + j02 * R[2, 0]
    a01 = j00 * R[0, 1] + j02 * R[2, 1]
    a02 = j00 * R[0, 2] + j02 * R[2, 2]
    a10 = j11 * R[1, 0] + j12 * R[2, 0]
    a11 = j11 * R[1, 1] + j12 * R[2, 1]
    a12 = j11 * R[1, 2] + j12 * R[2, 2]

    # M = R(q)·diag(s); cov2d = (A M)(A M)ᵀ — all (N,) components
    q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]

    # B = A · R(q): 2×3 of (N,) components; then scale columns by s
    b00 = (a00 * r00 + a01 * r10 + a02 * r20) * s0
    b01 = (a00 * r01 + a01 * r11 + a02 * r21) * s1
    b02 = (a00 * r02 + a01 * r12 + a02 * r22) * s2
    b10 = (a10 * r00 + a11 * r10 + a12 * r20) * s0
    b11 = (a10 * r01 + a11 * r11 + a12 * r21) * s1
    b12 = (a10 * r02 + a11 * r12 + a12 * r22) * s2

    # low-pass dilation (anti-aliasing floor), as in the CUDA kernel
    c_a = b00 * b00 + b01 * b01 + b02 * b02 + 0.3
    c_b = b00 * b10 + b01 * b11 + b02 * b12
    c_c = b10 * b10 + b11 * b11 + b12 * b12 + 0.3

    det = c_a * c_c - c_b * c_b
    det = jnp.where(det > 1e-12, det, 1e-12)
    conic = jnp.stack([c_c / det, -c_b / det, c_a / det], -1)

    mid = 0.5 * (c_a + c_c)
    lam1 = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    radius = jnp.where(in_front, radius, 0.0)
    return means2d, z, conic, radius, in_front


# ---------------------------------------------------------------------------
# tile binning: duplicate-into-tiles + ONE batched sort (TPU-native)
# ---------------------------------------------------------------------------
#
# The CUDA rasterizer builds dynamic (tile, depth)-keyed duplicate lists and
# radix-sorts them. A first TPU port used per-chunk scatters instead — 10M
# serialized scatter-writes per camera (~93 ms measured on v5e, the single
# hottest op in the whole system). This version is scatter-free:
#   key = tile_id · N + depth_rank  (int32),  one lax.sort over all
#   duplicates of ALL cameras at once, per-tile segments located by a
#   vectorized binary search, (T, K) lists read back with plain gathers.
# Batched over cameras because TPU sort throughput is much higher on
# multi-row inputs (measured: 1 row of 512K keys ≈ 5.8 ms, 8 rows ≈ 7.5 ms).

def _searchsorted_rows(sorted_rows: jnp.ndarray, qs: jnp.ndarray):
    """Leftmost insertion points of qs (Q,) into each row of
    sorted_rows (B, L): returns (B, Q) int32. Vectorized binary search —
    jnp.searchsorted under vmap lowers to a far slower path on TPU."""
    B, L = sorted_rows.shape
    Q = qs.shape[0]
    flat = sorted_rows.reshape(-1)
    row_off = (jnp.arange(B, dtype=jnp.int32) * L)[:, None]
    lo = jnp.zeros((B, Q), jnp.int32)
    hi = jnp.full((B, Q), L, jnp.int32)
    steps = max(int(math.ceil(math.log2(max(L, 2)))) + 1, 1)

    def body(_, lohi):
        lo, hi = lohi
        # freeze converged lanes: once lo == hi, an extra iteration with
        # mid == lo == L reads the clipped last element and could push
        # lo to L+1 when every key in the row is < q
        active = lo < hi
        mid = (lo + hi) // 2
        v = flat[jnp.clip(mid, 0, L - 1) + row_off]
        go_right = (v < qs[None, :]) & active
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(active & ~go_right, mid, hi))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def bin_gaussians_batch(means2d, radius, depth, visible, n_tiles_x,
                        n_tiles_y, K, max_span=4):
    """Per-tile depth-ordered contributor lists for a camera batch.

    means2d/radius/depth/visible: (B, N); returns
    (tile_ids (B, T, K) int32 gaussian indices, -1 pad;
     tile_counts (B, T) int32 including overflow beyond K).

    max_span: tiles covered per axis per Gaussian. A Gaussian whose 3σ
    bounding box spans more tiles is cropped to a max_span×max_span tile
    window centred on its projection (radius ≤ 8·(max_span−2) px is exact;
    the CUDA original has no such cap, but such huge splats contribute
    mostly sub-ALPHA_MIN tails in the cropped ring and are prune targets).
    """
    B, N = means2d.shape[:2]
    T = n_tiles_x * n_tiles_y

    # sort key: (tile, depth). Preferred form packs a 16-bit depth
    # quantization into the key (key = tile·2¹⁶ + q16) — it removes the
    # two (B, N) rank argsorts the exact form needs (the double-argsort
    # rank is only required when tile·N would overflow int32). 0.06 mm
    # depth bins at 4 m scene scale: order ties within a bin are
    # arbitrary, far below any visible compositing difference.
    use_q16 = (T + 1) < (1 << 15)
    if use_q16:
        d_vis = jnp.where(visible, depth, jnp.nan)
        dmin = jnp.nanmin(d_vis, axis=1, keepdims=True)
        dmax = jnp.nanmax(d_vis, axis=1, keepdims=True)
        dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        dmax = jnp.where(jnp.isfinite(dmax), dmax, 1.0)
        scale = 65535.0 / jnp.maximum(dmax - dmin, 1e-9)
        rank = jnp.clip((depth - dmin) * scale, 0, 65535).astype(jnp.int32)
        KEYB = 1 << 16
    else:
        if (T + 1) * N >= 2**31:
            raise ValueError(
                f"tile-sort key overflow: tiles({T})·capacity({N}) must "
                "be < 2^31; reduce the Gaussian capacity or image size")
        # depth ranks (inverse of the depth argsort) — double argsort is
        # scatter-free and batches well on TPU
        order = jnp.argsort(jnp.where(visible, depth, jnp.inf), axis=1)
        rank = jnp.argsort(order, axis=1).astype(jnp.int32)
        KEYB = N

    u, v = means2d[..., 0], means2d[..., 1]
    x0 = jnp.clip(jnp.floor((u - radius) / TILE), 0, n_tiles_x - 1)
    x1 = jnp.clip(jnp.floor((u + radius) / TILE), 0, n_tiles_x - 1)
    y0 = jnp.clip(jnp.floor((v - radius) / TILE), 0, n_tiles_y - 1)
    y1 = jnp.clip(jnp.floor((v + radius) / TILE), 0, n_tiles_y - 1)
    on_img = ((u + radius >= 0) & (u - radius < n_tiles_x * TILE)
              & (v + radius >= 0) & (v - radius < n_tiles_y * TILE))
    ok = visible & (radius > 0) & on_img
    x0, x1 = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0, y1 = y0.astype(jnp.int32), y1.astype(jnp.int32)

    # span window centred on the projected mean, cropped to the bbox
    ctx = jnp.clip(jnp.floor(u / TILE).astype(jnp.int32), x0, x1)
    cty = jnp.clip(jnp.floor(v / TILE).astype(jnp.int32), y0, y1)
    sx = jnp.clip(ctx - (max_span - 1) // 2,
                  x0, jnp.maximum(x1 - max_span + 1, x0))
    sy = jnp.clip(cty - (max_span - 1) // 2,
                  y0, jnp.maximum(y1 - max_span + 1, y0))

    offs = jnp.arange(max_span, dtype=jnp.int32)
    tx = sx[..., None] + offs                     # (B, N, S)
    ty = sy[..., None] + offs
    vx = tx <= x1[..., None]
    vy = ty <= y1[..., None]
    tile = ty[..., :, None] * n_tiles_x + tx[..., None, :]   # (B, N, S, S)
    val = ok[..., None, None] & vy[..., :, None] & vx[..., None, :]
    key = jnp.where(val, tile * KEYB + rank[..., None, None],
                    jnp.iinfo(jnp.int32).max)
    gid = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :, None, None], key.shape)

    L = N * max_span * max_span
    skey, sgid = jax.lax.sort(
        [key.reshape(B, L), gid.reshape(B, L)], dimension=1, num_keys=1)

    bounds = _searchsorted_rows(
        skey, jnp.arange(T + 1, dtype=jnp.int32) * KEYB)     # (B, T+1)
    starts = bounds[:, :-1]
    pos = jnp.clip(starts[:, :, None] + jnp.arange(K, dtype=jnp.int32),
                   0, L - 1)                                  # (B, T, K)
    flat = (pos + (jnp.arange(B, dtype=jnp.int32) * L)[:, None, None]
            ).reshape(-1)
    kk = skey.reshape(-1)[flat].reshape(B, T, K)
    ids = jnp.where(
        kk // KEYB == jnp.arange(T, dtype=jnp.int32)[None, :, None],
        sgid.reshape(-1)[flat].reshape(B, T, K), -1)
    counts = bounds[:, 1:] - starts
    return ids, counts


@partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y", "K",
                                   "max_span"))
def bin_gaussians(means2d, radius, depth, visible, n_tiles_x, n_tiles_y,
                  K, max_span=4):
    """Single-camera wrapper around bin_gaussians_batch (same contract as
    the original scatter-based implementation; output verified identical)."""
    ids, counts = bin_gaussians_batch(
        means2d[None], radius[None], depth[None], visible[None],
        n_tiles_x, n_tiles_y, K, max_span)
    return ids[0], counts[0]


# ---------------------------------------------------------------------------
# per-tile compositing
# ---------------------------------------------------------------------------

def _tile_pixel_grid(n_tiles_x, n_tiles_y):
    """Pixel coordinates per tile: (T, TILE*TILE, 2)."""
    px = jnp.arange(TILE, dtype=jnp.float32)
    pyy, pxx = jnp.meshgrid(px, px, indexing="ij")
    local = jnp.stack([pxx, pyy], -1).reshape(-1, 2)          # (256, 2)
    tx = jnp.arange(n_tiles_x, dtype=jnp.float32) * TILE
    ty = jnp.arange(n_tiles_y, dtype=jnp.float32) * TILE
    off = jnp.stack([jnp.tile(tx, n_tiles_y),
                     jnp.repeat(ty, n_tiles_x)], -1)          # (T,2)
    return off[:, None, :] + local[None, :, :]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderOutput:
    color: jnp.ndarray      # (H, W, 3)
    depth: jnp.ndarray      # (H, W)
    alpha: jnp.ndarray      # (H, W)
    radii: jnp.ndarray      # (N,)
    n_touched: jnp.ndarray  # (N,) int32
    means2d: jnp.ndarray    # (N, 2) projected centers (for inspection)


def _chunk_alpha(pk, ids_k, pix_x, pix_y):
    """Per-chunk Gaussian evaluation: returns (dx, dy, alpha_raw, alpha,
    live) with alpha zeroed for dead contributors (CUDA gating)."""
    dx = pix_x - pk[..., 0:1]                                 # (T,c,P)
    dy = pix_y - pk[..., 1:2]
    power = -0.5 * (pk[..., 2:3] * dx * dx
                    + pk[..., 4:5] * dy * dy) \
        - pk[..., 3:4] * dx * dy
    alpha_raw = pk[..., 8:9] * jnp.exp(power)
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    live = ~((power > 0) | (alpha < ALPHA_MIN)
             | (ids_k[:, :, None] < 0))
    return dx, dy, power, alpha_raw, jnp.where(live, alpha, 0.0), live


def _composite_scan(tile_ids, pix, tl, chunk_k, with_residuals):
    """Shared forward: returns outputs (+ per-chunk entry transmittance
    when with_residuals, for the hand-written backward)."""
    T, K = tile_ids.shape
    n_chunks = K // chunk_k
    ids_c = tile_ids.reshape(T, n_chunks, chunk_k)
    tl_c = tl.reshape(T, n_chunks, chunk_k, 10)
    # (T, c, P) layout throughout: the pixel axis (P = 256 = 2×128 lanes)
    # stays minor, so every temporary tiles perfectly; a (T, P, c) form
    # pads the 32-wide chunk axis to 128 lanes (4× HBM traffic).
    pix_x = pix[:, None, :, 0]                                # (T,1,P)
    pix_y = pix[:, None, :, 1]

    def chunk_body(carry, xs):
        ids_k, pk = xs
        trans, color, depth = carry                # (T,P) (T,3,P) (T,P)
        _, _, _, _, alpha, _ = _chunk_alpha(pk, ids_k, pix_x, pix_y)

        # sequential transmittance inside the chunk via cumprod over c
        cum = jnp.cumprod(1.0 - alpha, axis=1)                 # (T,c,P)
        T_before = trans[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], 1)
        w_contrib = alpha * T_before
        # hard stop EXACTLY like CUDA: contributor i is dropped when its
        # inclusion would push T below T_MIN (test_T = T*(1-alpha) <
        # 1e-4, forward.cu). Monotone, so all later contributors fail
        # the same test -> equivalent to the CUDA loop break.
        w_contrib = jnp.where(T_before * (1.0 - alpha) < T_MIN,
                              0.0, w_contrib)

        color = color + jnp.einsum("tcp,tcd->tdp", w_contrib,
                                   pk[..., 5:8])
        depth = depth + jnp.sum(w_contrib * pk[..., 9:10], 1)
        trans_new = trans * cum[:, -1]
        # pixels this contributor actually touched (for densify/prune)
        touched_k = jnp.sum(w_contrib > 0, axis=2).astype(jnp.int32)
        ys = (touched_k, trans) if with_residuals else touched_k
        return (trans_new, color, depth), ys

    P = pix.shape[1]
    init = (jnp.ones((T, P)), jnp.zeros((T, 3, P)), jnp.zeros((T, P)))
    (trans, color, depth), ys = jax.lax.scan(
        chunk_body, init,
        (ids_c.transpose(1, 0, 2), tl_c.transpose(1, 0, 2, 3)))
    touched = (ys[0] if with_residuals else ys)
    touched = touched.transpose(1, 0, 2).reshape(T, K)
    outs = (color.transpose(0, 2, 1), depth, 1.0 - trans, touched)
    return (outs, ys[1]) if with_residuals else outs


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _composite_core(tile_ids, pix, tl, chunk_k):
    """Differentiable compositing core over the tile-list tensor
    tl (T,K,10) (rows = [mean2d(2), conic(3), color(3), opacity(1),
    depth(1)], zeros at -1 padding slots).

    Custom VJP: XLA's autodiff of the chunked scan (cumprod backward +
    remat recompute) measured ~10× the forward; the hand-written reverse
    scan below is the classical 3DGS suffix-sum backward —
    dL/dαᵢ = T_beforeᵢ·sᵢ + (g_A·T_final − Σ_{j>i} wⱼsⱼ)/(1−αᵢ),
    computed back-to-front with one carried suffix accumulator.
    """
    return _composite_scan(tile_ids, pix, tl, chunk_k, False)


def _composite_core_fwd(tile_ids, pix, tl, chunk_k):
    outs, trans_in = _composite_scan(tile_ids, pix, tl, chunk_k, True)
    # residuals: chunk-entry transmittance (n_chunks, T, P) + final trans
    return outs, (tile_ids, pix, tl, trans_in, 1.0 - outs[2])


def _composite_core_bwd(chunk_k, res, cts):
    tile_ids, pix, tl, trans_in, trans_final = res
    g_color, g_depth, g_alpha_out, _ = cts
    T, K = tile_ids.shape
    n_chunks = K // chunk_k
    ids_c = tile_ids.reshape(T, n_chunks, chunk_k).transpose(1, 0, 2)
    tl_c = tl.reshape(T, n_chunks, chunk_k, 10).transpose(1, 0, 2, 3)
    pix_x = pix[:, None, :, 0]
    pix_y = pix[:, None, :, 1]
    g_c = g_color.transpose(0, 2, 1)                          # (T,3,P)
    G = g_alpha_out * trans_final                             # (T,P)

    def chunk_bwd(S_carry, xs):
        ids_k, pk, tr_in = xs
        dx, dy, power, alpha_raw, alpha, live = _chunk_alpha(
            pk, ids_k, pix_x, pix_y)
        cum = jnp.cumprod(1.0 - alpha, axis=1)
        T_before = tr_in[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], 1)
        w_live = T_before * (1.0 - alpha) >= T_MIN
        w = jnp.where(w_live, alpha * T_before, 0.0)

        # per-contributor pixel scalar sᵢ = colᵢ·g_c + depᵢ·g_d
        s = jnp.einsum("tdp,tcd->tcp", g_c, pk[..., 5:8]) \
            + g_depth[:, None, :] * pk[..., 9:10]
        contrib = w * s                                        # (T,c,P)
        # suffix over later contributors: within-chunk reversed cumsum
        rev = jnp.cumsum(contrib[:, ::-1], axis=1)[:, ::-1]
        S_after = jnp.concatenate(
            [rev[:, 1:], jnp.zeros_like(rev[:, :1])], 1) + S_carry[:, None]

        galpha = jnp.where(w_live, T_before * s, 0.0) \
            + (G[:, None] - S_after) / (1.0 - alpha)
        galpha = jnp.where(live, galpha, 0.0)
        # through the MAX_ALPHA clamp: dα/dpower = alpha_raw if unclamped
        g_pow = jnp.where(alpha_raw < MAX_ALPHA,
                          galpha * alpha_raw, 0.0)
        g_opa = jnp.where(alpha_raw < MAX_ALPHA,
                          galpha * jnp.exp(power), 0.0)
        a_, b_, c_ = pk[..., 2:3], pk[..., 3:4], pk[..., 4:5]
        g_mx = jnp.sum(g_pow * (a_ * dx + b_ * dy), 2)         # (T,c)
        g_my = jnp.sum(g_pow * (c_ * dy + b_ * dx), 2)
        g_ca = jnp.sum(g_pow * (-0.5 * dx * dx), 2)
        g_cb = jnp.sum(g_pow * (-dx * dy), 2)
        g_cc = jnp.sum(g_pow * (-0.5 * dy * dy), 2)
        g_col = jnp.einsum("tcp,tdp->tcd", w, g_c)             # (T,c,3)
        g_op = jnp.sum(g_opa, 2)
        g_dep = jnp.sum(w * g_depth[:, None, :], 2)
        g_tl_k = jnp.concatenate(
            [g_mx[..., None], g_my[..., None], g_ca[..., None],
             g_cb[..., None], g_cc[..., None], g_col,
             g_op[..., None], g_dep[..., None]], -1)           # (T,c,10)
        return S_carry + rev[:, 0], g_tl_k

    S0 = jnp.zeros_like(G)
    _, g_tl = jax.lax.scan(chunk_bwd, S0,
                           (ids_c, tl_c, trans_in), reverse=True)
    g_tl = g_tl.transpose(1, 0, 2, 3).reshape(T, K, 10)
    return None, None, g_tl


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


def _composite(tile_ids, pix, packets, chunk_k):
    """Front-to-back compositing over per-tile contributor lists.

    tile_ids (T, K); pix (T, P, 2); packets (N+1, 10) rows =
    [mean2d(2), conic(3), color(3), opacity(1), depth(1)] with a zero row
    appended for the -1 padding index.
    Returns color (T,P,3), depth (T,P), alpha (T,P), and touched (T,K)
    int32 — per-entry count of pixels with nonzero contribution (the
    n_touched fallback path sums these counts per Gaussian).
    """
    # ONE gather into tile-list layout OUTSIDE the differentiable core;
    # its VJP is a single scatter-add back into the packet rows.
    tl = packets[jnp.where(tile_ids >= 0, tile_ids,
                           packets.shape[0] - 1)]             # (T,K,10)
    return _composite_core(tile_ids, pix, tl, chunk_k)


# ---------------------------------------------------------------------------
# Pallas compositing path (TPU): dynamic per-tile trip counts, early
# termination, and scatter-free gradient/touch accumulation. See
# ops/raster_pallas.py for the kernels and the design rationale.
# ---------------------------------------------------------------------------

_PALLAS_MAX_ROWS = 1 << 18   # VMEM accumulator cap: (16, N) f32 ≤ 16.8 MB
                             # (v5e VMEM is 128 MB; kernels run with a
                             # 100 MB scoped limit)
_warned_demotion = set()


def _pallas_ok(n_rows: int) -> bool:
    import os
    if os.environ.get("SPLATSLAM_NO_PALLAS"):
        return False
    if n_rows > _PALLAS_MAX_ROWS or n_rows % 128:
        # never silent: above this capacity compositing falls back to
        # the (much slower) XLA scan path
        if n_rows not in _warned_demotion:
            _warned_demotion.add(n_rows)
            import sys
            print(f"[rasterizer] capacity {n_rows} demotes compositing "
                  f"to the XLA fallback (Pallas cap {_PALLAS_MAX_ROWS}, "
                  "needs multiple-of-128 rows)", file=sys.stderr,
                  flush=True)
        return False
    try:
        # honor an explicit CPU default-device pin (the test env pins
        # computation to CPU while the machine's default backend is the
        # tunneled TPU — compiled Pallas kernels only run on real TPU)
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
            return False
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_prep(tile_ids, counts, packets):
    """Gather per-camera packets into the (B·T, 10, K) tile-list layout.
    Also returns the ids as a (B·T, 1, K) int32 SMEM mirror — the
    kernels read per-entry accumulator block indices AND lane masks from
    SMEM scalars, so no id row rides in the float tile lists (the former
    16-row layout spent 6/16 of the gather+DMA traffic on the id row and
    zero padding)."""
    B, T, K = tile_ids.shape
    N = packets.shape[1]
    packets_pad = jnp.concatenate(
        [packets, jnp.zeros((B, 1, 10), packets.dtype)], 1)
    idsafe = jnp.where(tile_ids >= 0, tile_ids, N)
    tl = jnp.take_along_axis(
        packets_pad, idsafe.reshape(B, T * K)[..., None],
        axis=1).reshape(B * T, K, 10)
    tl_T = tl.transpose(0, 2, 1)
    ids_smem = tile_ids.reshape(B * T, 1, K).astype(jnp.int32)
    return tl_T, ids_smem, counts.reshape(B * T).astype(jnp.int32)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_tiles_pallas(tile_ids, counts, packets, ntx, n_cam_tiles,
                            want_touched):
    """tile_ids (B,T,K) per-camera ids; counts (B,T); packets (B,N,10).
    Returns color (B·T,P,3), depth (B·T,P), alpha (B·T,P),
    n_touched (B,N) int32 (zeros when want_touched=False — the fwd
    kernel statically skips the per-entry accumulation)."""
    return _ctp_fwd(tile_ids, counts, packets, ntx, n_cam_tiles,
                    want_touched)[0]


def _ctp_fwd(tile_ids, counts, packets, ntx, n_cam_tiles, want_touched):
    from . import raster_pallas as rp
    B, T, K = tile_ids.shape
    N = packets.shape[1]
    tl_T, ids_smem, counts_flat = _pallas_prep(tile_ids, counts, packets)
    out, ntouch = rp.composite_fwd_pallas(
        counts_flat, tl_T, ids_smem, B, n_cam_tiles, ntx, N,
        want_touched=want_touched)
    if want_touched:
        nt = ntouch[:, :, 0, :].reshape(B, N).astype(jnp.int32)
    else:
        nt = jnp.zeros((B, N), jnp.int32)
    outs = (out[:, 0:3, :].transpose(0, 2, 1), out[:, 3, :],
            out[:, 4, :], nt)
    # `out` rides into the bwd kernel: it supplies T_final and Σwᵢsᵢ,
    # replacing a full recompute sweep over the tile lists
    return outs, (tl_T, ids_smem, counts_flat, out, B, N)


def _ctp_bwd(ntx, n_cam_tiles, want_touched, res, cts):
    from . import raster_pallas as rp
    tl_T, ids_smem, counts_flat, fwdout, B, N = res
    g_color, g_depth, g_alpha, _ = cts
    BT = tl_T.shape[0]
    Pp = g_color.shape[1]
    gpack = jnp.concatenate(
        [g_color.transpose(0, 2, 1), g_depth[:, None, :],
         g_alpha[:, None, :], jnp.zeros((BT, 3, Pp), g_color.dtype)], 1)
    acc = rp.composite_bwd_pallas(
        counts_flat, tl_T, ids_smem, gpack, fwdout, B, n_cam_tiles,
        ntx, N)
    # (B, N/128, 16, 128) blocked → (B, N, 10)
    acc = acc.transpose(0, 2, 1, 3).reshape(B, 16, N)
    grad_packets = acc[:, :10, :].transpose(0, 2, 1)
    return None, None, grad_packets


_composite_tiles_pallas.defvjp(_ctp_fwd, _ctp_bwd)


def _project_cameras(means3D, scales, rotations, alive, w2cs, taus,
                     intrinsics, H, W, near):
    """Shared camera-batch projection prologue: retract pose deltas
    (w2c ← exp(tau) ∘ w2c), vmap project_gaussians, apply the alive
    mask. One definition for bin_batch / raster_health /
    rasterize_batch so the pose-delta and visibility conventions cannot
    drift apart. Returns (means2d, depth_z, conic, radius, visible)."""
    dT = jax.vmap(lambda t: lie.to_matrix(lie.exp(t)))(taus)
    w2c_t = dT @ w2cs
    means2d, depth_z, conic, radius, in_front = jax.vmap(
        project_gaussians,
        in_axes=(None, None, None, 0, None, None, None, None))(
            means3D, scales, rotations, w2c_t, intrinsics, H, W, near)
    return means2d, depth_z, conic, radius, in_front & alive[None]


def _bin_radius(radius, opacities, margin=0.0):
    """Binning radius: exact alpha-cutoff shrink of the 3σ radius.

    Compositing gates alpha < 1/255 to zero, so any pixel beyond
    σ·√(2·ln(255·opa)) contributes NOTHING — binning those pixels' tiles
    only pads the per-tile lists with dead entries (output-identical,
    measured counts drop ~2-3× mid-optimization when opacity resets
    leave many near-transparent Gaussians). `margin` (pixels) widens the
    footprint so a tile list can be REUSED for several optimization
    iterations while means drift (mapper.map_step_n rebin cadence).
    """
    opa_c = jnp.clip(opacities, 0.0, 1.0)
    cut = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * opa_c), 0.0))
    bin_scale = jnp.minimum(cut / 3.0, 1.0)          # (N,)
    r = radius * bin_scale[None]
    if margin:
        r = jnp.where(r > 0, r + margin, 0.0)
    return r


@partial(jax.jit, static_argnames=("H", "W", "K", "max_span", "near",
                                   "margin"))
def bin_batch(means3D, scales, rotations, opacities, alive, w2cs, taus,
              intrinsics, *, H: int, W: int, K: int, max_span: int = 4,
              near: float = 0.01, margin: float = 0.0):
    """Standalone tile binning for a camera batch (same geometry as
    rasterize_batch). Returns (tile_ids (B,T,K), tile_counts (B,T)) to
    feed rasterize_batch's `tile_ids`/`tile_counts` — the mapper reuses
    one binning across several optimization iterations (the full
    multi-million-key sort was ~1/6 of each training step)."""
    n_tiles_x = (W + TILE - 1) // TILE
    n_tiles_y = (H + TILE - 1) // TILE
    means2d, depth_z, _, radius, visible = _project_cameras(
        means3D, scales, rotations, alive, w2cs, taus, intrinsics,
        H, W, near)
    return bin_gaussians_batch(
        means2d, _bin_radius(radius, opacities, margin), depth_z, visible,
        n_tiles_x, n_tiles_y, K, max_span)


@partial(jax.jit, static_argnames=("H", "W", "K", "max_span", "near"))
def raster_health(means3D, scales, rotations, opacities, alive, w2cs, taus,
                  intrinsics, *, H: int, W: int, K: int, max_span: int = 4,
                  near: float = 0.01):
    """Accounting for the rasterizer's two bounded-work caps.

    Returns (overflow_frac, crop_frac, max_count):
      * overflow_frac — fraction of binned tile entries beyond the K
        contributors a tile keeps (those are dropped, far-behind first);
      * crop_frac — fraction of visible Gaussians whose 3σ/alpha-cutoff
        bbox spans more than max_span tiles per axis (their footprint is
        cropped to a max_span window);
      * max_count — densest tile's contributor count.
    The mapper logs these periodically so neither cap is ever a silent
    quality cliff (the CUDA reference has no such caps).
    """
    n_tiles_x = (W + TILE - 1) // TILE
    n_tiles_y = (H + TILE - 1) // TILE
    means2d, depth_z, _, radius, visible = _project_cameras(
        means3D, scales, rotations, alive, w2cs, taus, intrinsics,
        H, W, near)
    r = _bin_radius(radius, opacities)
    _, counts = bin_gaussians_batch(
        means2d, r, depth_z, visible, n_tiles_x, n_tiles_y, K, max_span)
    total = jnp.maximum(jnp.sum(counts), 1)
    overflow = jnp.sum(jnp.maximum(counts - K, 0)) / total

    u, v = means2d[..., 0], means2d[..., 1]
    x0 = jnp.clip(jnp.floor((u - r) / TILE), 0, n_tiles_x - 1)
    x1 = jnp.clip(jnp.floor((u + r) / TILE), 0, n_tiles_x - 1)
    y0 = jnp.clip(jnp.floor((v - r) / TILE), 0, n_tiles_y - 1)
    y1 = jnp.clip(jnp.floor((v + r) / TILE), 0, n_tiles_y - 1)
    binned = visible & (r > 0)
    big = binned & ((x1 - x0 + 1 > max_span) | (y1 - y0 + 1 > max_span))
    crop = jnp.sum(big) / jnp.maximum(jnp.sum(binned), 1)
    return overflow, crop, counts.max()


@partial(jax.jit, static_argnames=("H", "W", "K", "chunk_k", "max_span",
                                   "want_touched"))
def rasterize_batch(means3D, scales, rotations, opacities, colors, alive,
                    w2cs, taus, intrinsics, bg, means2d_dummy=None,
                    tile_ids=None, tile_counts=None, *,
                    H: int, W: int, K: int = 512, chunk_k: int = 32,
                    max_span: int = 4, near: float = 0.01,
                    want_touched: bool = True):
    """Render ONE Gaussian set into a BATCH of cameras in one program.

    Batched rendering is the TPU-shaped form of the mapper's window
    optimization (the reference renders window cameras one CUDA launch at
    a time, mapper.py:414-490): binning rides a single multi-row sort and
    compositing folds cameras into the tile axis, so per-op fixed costs
    amortize across the window.

    means3D (N,3); scales (N,3); rotations (N,4) wxyz; opacities (N,);
    colors (N,3) shared or (B,N,3) per-camera (SH path); alive (N,) bool;
    w2cs (B,4,4); taus (B,6) pose deltas, exp(tau)∘w2c per camera;
    intrinsics (fx,fy,cx,cy); bg (3,); means2d_dummy (B,N,2) zeros.
    tile_ids/tile_counts: optional prebinned lists from bin_batch —
    when given, the in-program binning sort is skipped.
    want_touched=False skips the per-Gaussian touch-count accumulation
    (n_touched comes back all-zero) — it is only consumed at
    densify/visibility gates, not in the hot optimization iterations.
    Returns RenderOutput with a leading camera dim on every field.
    """
    B = w2cs.shape[0]
    N = means3D.shape[0]
    if means2d_dummy is None:
        means2d_dummy = jnp.zeros((B, N, 2), means3D.dtype)
    if colors.ndim == 2:
        colors = jnp.broadcast_to(colors[None], (B, N, 3))

    n_tiles_x = (W + TILE - 1) // TILE
    n_tiles_y = (H + TILE - 1) // TILE
    T = n_tiles_x * n_tiles_y

    means2d, depth_z, conic, radius, visible = _project_cameras(
        means3D, scales, rotations, alive, w2cs, taus, intrinsics,
        H, W, near)
    means2d = means2d + means2d_dummy

    if tile_ids is None:
        tile_ids, tile_counts = bin_gaussians_batch(
            jax.lax.stop_gradient(means2d),
            jax.lax.stop_gradient(_bin_radius(radius, opacities)),
            jax.lax.stop_gradient(depth_z), visible,
            n_tiles_x, n_tiles_y, K, max_span)

    packets = jnp.concatenate([
        means2d, conic, colors,
        jnp.broadcast_to(jnp.clip(opacities, 0.0, 1.0)[None, :, None],
                         (B, N, 1)),
        depth_z[..., None]], -1)                               # (B, N, 10)

    if _pallas_ok(N):
        color_t, depth_t, alpha_t, n_touched = _composite_tiles_pallas(
            tile_ids, tile_counts, packets, n_tiles_x, T, want_touched)
        n_touched = jax.lax.stop_gradient(n_touched)
    else:
        # XLA fallback (CPU tests / capacities beyond the VMEM cap):
        # fold cameras into the tile axis, one zero row appended globally
        # for the -1 padding lookups
        packets_flat = jnp.concatenate(
            [packets.reshape(B * N, 10),
             jnp.zeros((1, 10), packets.dtype)], 0)
        cam_off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        ids_glob = jnp.where(tile_ids >= 0, tile_ids + cam_off, -1)

        pix = _tile_pixel_grid(n_tiles_x, n_tiles_y)
        pix_b = jnp.broadcast_to(pix[None], (B,) + pix.shape).reshape(
            B * T, -1, 2)
        color_t, depth_t, alpha_t, touched_t = _composite(
            ids_glob.reshape(B * T, K), pix_b, packets_flat, chunk_k)
        if want_touched:
            flat_ids = jnp.where(ids_glob >= 0, ids_glob,
                                 B * N).reshape(-1)
            n_touched = jax.ops.segment_sum(
                touched_t.reshape(B * T * K), flat_ids,
                num_segments=B * N + 1)[:-1].reshape(B, N)
            n_touched = jax.lax.stop_gradient(n_touched)
        else:
            n_touched = jnp.zeros((B, N), jnp.int32)

    color_t = color_t + (1.0 - alpha_t)[..., None] * bg

    def untile(x, c):
        img = x.reshape(B, n_tiles_y, n_tiles_x, TILE, TILE, c)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, n_tiles_y * TILE, n_tiles_x * TILE, c)
        return img[:, :H, :W]

    color = untile(color_t, 3)
    depth = untile(depth_t, 1)[..., 0]
    alpha = untile(alpha_t, 1)[..., 0]

    radii = jax.lax.stop_gradient(jnp.where(visible, radius, 0.0))
    return RenderOutput(color=color, depth=depth, alpha=alpha, radii=radii,
                        n_touched=n_touched, means2d=means2d)


def rasterize(means3D, scales, rotations, opacities, colors, alive,
              w2c, tau, intrinsics, bg, means2d_dummy=None, *,
              H: int, W: int, K: int = 512, chunk_k: int = 32,
              max_span: int = 4, near: float = 0.01):
    """Render Gaussians; differentiable in all Gaussian params and tau.

    Single-camera convenience wrapper over rasterize_batch (B = 1).
    means3D (N,3); scales (N,3) positive; rotations (N,4) wxyz;
    opacities (N,) in [0,1]; colors (N,3); alive (N,) bool;
    w2c (4,4) base pose; tau (6,) = [rho(trans), theta(rot)] delta applied
    as exp(tau) ∘ w2c (monogs pose_utils.py:81-98 convention);
    intrinsics (fx,fy,cx,cy); bg (3,);
    means2d_dummy (N,2) zeros — gradients w.r.t. it are the screen-space
    gradients used for densification.
    """
    out = rasterize_batch(
        means3D, scales, rotations, opacities, colors, alive,
        w2c[None], tau[None], intrinsics, bg,
        None if means2d_dummy is None else means2d_dummy[None],
        H=H, W=W, K=K, chunk_k=chunk_k, max_span=max_span, near=near)
    return RenderOutput(
        color=out.color[0], depth=out.depth[0], alpha=out.alpha[0],
        radii=out.radii[0], n_touched=out.n_touched[0],
        means2d=out.means2d[0])


def rasterize_reference(means3D, scales, rotations, opacities, colors,
                        alive, w2c, tau, intrinsics, bg, *, H, W,
                        near: float = 0.01):
    """Slow exact renderer: every pixel × every Gaussian, global depth
    order, no tiling and no contributor cap. Ground truth for tests."""
    N = means3D.shape[0]
    dT = lie.to_matrix(lie.exp(tau))
    w2c_t = dT @ w2c
    means2d, depth_z, conic, radius, in_front = project_gaussians(
        means3D, scales, rotations, w2c_t, intrinsics, H, W, near)
    visible = in_front & alive & (radius > 0)

    order = jnp.argsort(jnp.where(visible, depth_z, jnp.inf))
    m2d = means2d[order]
    con = conic[order]
    col = colors[order]
    opa = jnp.clip(opacities, 0.0, 1.0)[order]
    dep = depth_z[order]
    vis = visible[order]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)              # (HW, 2)

    d = pix[:, None, :] - m2d[None, :, :]                     # (HW, N, 2)
    power = -0.5 * (con[None, :, 0] * d[..., 0] ** 2
                    + con[None, :, 2] * d[..., 1] ** 2) \
        - con[None, :, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(MAX_ALPHA, opa[None, :] * jnp.exp(power))
    alpha = jnp.where((power > 0) | (alpha < ALPHA_MIN) | ~vis[None, :],
                      0.0, alpha)
    cum = jnp.cumprod(1.0 - alpha, axis=1)
    T_before = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], 1)
    w_c = alpha * T_before
    w_c = jnp.where(T_before * (1.0 - alpha) < T_MIN, 0.0, w_c)
    color = (w_c[..., None] * col[None]).sum(1)
    depth = (w_c * dep[None]).sum(1)
    a_acc = w_c.sum(1)
    color = color + (1 - a_acc)[:, None] * bg
    return (color.reshape(H, W, 3), depth.reshape(H, W),
            a_acc.reshape(H, W))
