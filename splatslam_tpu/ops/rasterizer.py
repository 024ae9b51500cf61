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
from functools import partial

import jax
import jax.numpy as jnp

from . import lie

TILE = 16
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4
MAX_ALPHA = 0.99


# ---------------------------------------------------------------------------
# quaternion/scale → 3D covariance
# ---------------------------------------------------------------------------

def build_covariance(scales: jnp.ndarray, rotations: jnp.ndarray):
    """Σ = R S Sᵀ Rᵀ from per-Gaussian log-free scales (N,3) and unit
    quaternions (N,4) stored wxyz like the reference GaussianModel."""
    q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))
    S = scales[..., None] * jnp.eye(3)
    M = R @ S
    return M @ M.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# projection + EWA splatting
# ---------------------------------------------------------------------------

def project_gaussians(means3D, scales, rotations, w2c, intrinsics, H, W,
                      near=0.01):
    """Project Gaussians: returns (means2d, depth, conic, radius, in_front).

    w2c (4,4); intrinsics (fx,fy,cx,cy). conic is the upper triangle
    (a, b, c) of the inverse 2D covariance.
    """
    fx, fy, cx, cy = intrinsics
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    p_cam = means3D @ R.T + t
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
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

    o = jnp.zeros_like(zc)
    J = jnp.stack([
        fx / zc, o, -fx * txz / zc,
        o, fy / zc, -fy * tyz / zc,
    ], -1).reshape(-1, 2, 3)

    cov3d = build_covariance(scales, rotations)
    JR = J @ R
    cov2d = JR @ cov3d @ JR.transpose(0, 2, 1)
    # low-pass dilation (anti-aliasing floor), as in the CUDA kernel
    cov2d = cov2d + 0.3 * jnp.eye(2)

    det = (cov2d[:, 0, 0] * cov2d[:, 1, 1]
           - cov2d[:, 0, 1] * cov2d[:, 1, 0])
    det = jnp.where(det > 1e-12, det, 1e-12)
    conic = jnp.stack([cov2d[:, 1, 1] / det,
                       -cov2d[:, 0, 1] / det,
                       cov2d[:, 0, 0] / det], -1)

    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    radius = jnp.where(in_front, radius, 0.0)
    return means2d, z, conic, radius, in_front


# ---------------------------------------------------------------------------
# tile binning: global depth sort + chunked scatter compaction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y", "K", "chunk"))
def bin_gaussians(means2d, radius, depth, visible, n_tiles_x, n_tiles_y,
                  K, chunk=4096):
    """Build per-tile depth-ordered contributor lists.

    Returns (tile_ids (T, K) int32 gaussian indices (-1 pad),
             tile_counts (T,) including overflow beyond K).
    """
    N = means2d.shape[0]
    T = n_tiles_x * n_tiles_y
    order = jnp.argsort(jnp.where(visible, depth, jnp.inf))

    m2d = means2d[order]
    rad = radius[order]
    vis = visible[order]

    x0 = jnp.clip(jnp.floor((m2d[:, 0] - rad) / TILE), 0, n_tiles_x - 1)
    x1 = jnp.clip(jnp.floor((m2d[:, 0] + rad) / TILE), 0, n_tiles_x - 1)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - rad) / TILE), 0, n_tiles_y - 1)
    y1 = jnp.clip(jnp.floor((m2d[:, 1] + rad) / TILE), 0, n_tiles_y - 1)
    # a gaussian whose bounding box misses the image entirely
    on_img = ((m2d[:, 0] + rad >= 0) & (m2d[:, 0] - rad < n_tiles_x * TILE)
              & (m2d[:, 1] + rad >= 0) & (m2d[:, 1] - rad < n_tiles_y * TILE))
    ok = vis & (rad > 0) & on_img

    chunk = min(chunk, N)
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N

    def padc(a, fill=0):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) \
            if pad else a

    xs0 = padc(x0.astype(jnp.int32)).reshape(n_chunks, chunk)
    xs1 = padc(x1.astype(jnp.int32)).reshape(n_chunks, chunk)
    ys0 = padc(y0.astype(jnp.int32)).reshape(n_chunks, chunk)
    ys1 = padc(y1.astype(jnp.int32)).reshape(n_chunks, chunk)
    oks = padc(ok, False).reshape(n_chunks, chunk)
    gid = padc(order.astype(jnp.int32), -1).reshape(n_chunks, chunk)

    tx = jnp.arange(n_tiles_x, dtype=jnp.int32)
    ty = jnp.arange(n_tiles_y, dtype=jnp.int32)

    def body(carry, args):
        counts, ids = carry
        cx0, cx1, cy0, cy1, cok, cgid = args
        # overlap (T_y, T_x, chunk) → (T, chunk)
        ovx = (tx[None, :, None] >= cx0[None, None]) & \
              (tx[None, :, None] <= cx1[None, None])
        ovy = (ty[:, None, None] >= cy0[None, None]) & \
              (ty[:, None, None] <= cy1[None, None])
        ov = (ovx & ovy & cok[None, None]).reshape(T, chunk)
        pos = counts[:, None] + jnp.cumsum(ov, axis=1) - 1
        write = ov & (pos < K) & (pos >= 0)
        flat_idx = jnp.where(
            write,
            jnp.arange(T, dtype=jnp.int32)[:, None] * K + pos.astype(jnp.int32),
            T * K)
        ids = ids.reshape(-1)
        upd = jnp.where(write, jnp.broadcast_to(cgid[None, :], (T, chunk)), -1)
        padded = jnp.concatenate([ids, jnp.full((1,), -1, ids.dtype)])
        padded = padded.at[flat_idx.reshape(-1)].set(
            upd.reshape(-1), mode="drop")
        ids = padded[:-1].reshape(T, K)
        counts = counts + ov.sum(axis=1, dtype=jnp.int32)
        return (counts, ids), None

    counts0 = jnp.zeros((T,), jnp.int32)
    ids0 = jnp.full((T, K), -1, jnp.int32)
    (counts, ids), _ = jax.lax.scan(
        body, (counts0, ids0), (xs0, xs1, ys0, ys1, oks, gid))
    return ids, counts


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


def _composite(tile_ids, pix, packets, chunk_k):
    """Front-to-back compositing over per-tile contributor lists.

    tile_ids (T, K); pix (T, P, 2); packets (N+1, 10) rows =
    [mean2d(2), conic(3), color(3), opacity(1), depth(1)] with a zero row
    appended for the -1 padding index.
    Returns color (T,P,3), depth (T,P), alpha (T,P), touched (T,K) bool.
    """
    T, K = tile_ids.shape
    n_chunks = K // chunk_k

    ids_c = tile_ids.reshape(T, n_chunks, chunk_k)

    def chunk_body(carry, ids_k):
        trans, color, depth = carry
        pk = packets[jnp.where(ids_k >= 0, ids_k, packets.shape[0] - 1)]
        mean = pk[..., 0:2]                    # (T,c,2)
        con = pk[..., 2:5]
        col = pk[..., 5:8]
        opa = pk[..., 8]
        dep = pk[..., 9]

        d = pix[:, :, None, :] - mean[:, None, :, :]          # (T,P,c,2)
        power = -0.5 * (con[:, None, :, 0] * d[..., 0] ** 2
                        + con[:, None, :, 2] * d[..., 1] ** 2) \
            - con[:, None, :, 1] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(MAX_ALPHA, opa[:, None, :] * jnp.exp(power))
        alpha = jnp.where((power > 0) | (alpha < ALPHA_MIN) |
                          (ids_k[:, None, :] < 0), 0.0, alpha)

        # sequential transmittance inside the chunk via cumprod
        one_m = 1.0 - alpha                                    # (T,P,c)
        cum = jnp.cumprod(one_m, axis=-1)
        T_before = trans[:, :, None] * jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], -1)
        w_contrib = alpha * T_before
        # hard stop like CUDA: no contributions once T < T_MIN
        w_contrib = jnp.where(T_before < T_MIN, 0.0, w_contrib)

        color = color + jnp.einsum("tpc,tcd->tpd", w_contrib, col)
        depth = depth + jnp.sum(w_contrib * dep[:, None, :], -1)
        trans_new = trans * cum[..., -1]
        # pixels this contributor actually touched (for densify/prune)
        touched_k = jnp.sum(w_contrib > 0, axis=1).astype(jnp.int32)  # (T,c)
        return (trans_new, color, depth), touched_k

    P = pix.shape[1]
    init = (jnp.ones((T, P)), jnp.zeros((T, P, 3)), jnp.zeros((T, P)))
    (trans, color, depth), touched = jax.lax.scan(
        jax.checkpoint(chunk_body), init, ids_c.transpose(1, 0, 2))
    touched = touched.transpose(1, 0, 2).reshape(T, K)  # pixel counts
    return color, depth, 1.0 - trans, touched


@partial(jax.jit, static_argnames=("H", "W", "K", "chunk_k"))
def rasterize(means3D, scales, rotations, opacities, colors, alive,
              w2c, tau, intrinsics, bg, means2d_dummy=None, *,
              H: int, W: int, K: int = 512, chunk_k: int = 32,
              near: float = 0.01):
    """Render Gaussians; differentiable in all Gaussian params and tau.

    means3D (N,3); scales (N,3) positive; rotations (N,4) wxyz;
    opacities (N,) in [0,1]; colors (N,3); alive (N,) bool;
    w2c (4,4) base pose; tau (6,) = [rho(trans), theta(rot)] delta applied
    as exp(tau) ∘ w2c (monogs pose_utils.py:81-98 convention);
    intrinsics (fx,fy,cx,cy); bg (3,);
    means2d_dummy (N,2) zeros — gradients w.r.t. it are the screen-space
    gradients used for densification.
    """
    N = means3D.shape[0]
    if means2d_dummy is None:
        means2d_dummy = jnp.zeros((N, 2), means3D.dtype)

    dT = lie.to_matrix(lie.exp(tau))
    w2c_t = dT @ w2c

    n_tiles_x = (W + TILE - 1) // TILE
    n_tiles_y = (H + TILE - 1) // TILE
    T = n_tiles_x * n_tiles_y

    means2d, depth_z, conic, radius, in_front = project_gaussians(
        means3D, scales, rotations, w2c_t, intrinsics, H, W, near)
    means2d = means2d + means2d_dummy
    visible = in_front & alive

    tile_ids, tile_counts = bin_gaussians(
        jax.lax.stop_gradient(means2d), jax.lax.stop_gradient(radius),
        jax.lax.stop_gradient(depth_z), visible, n_tiles_x, n_tiles_y, K)

    packets = jnp.concatenate([
        means2d, conic, colors,
        jnp.clip(opacities, 0.0, 1.0)[:, None], depth_z[:, None]], -1)
    packets = jnp.concatenate([packets, jnp.zeros((1, 10), packets.dtype)], 0)

    pix = _tile_pixel_grid(n_tiles_x, n_tiles_y)
    color_t, depth_t, alpha_t, touched_t = _composite(
        tile_ids, pix, packets, chunk_k)

    # blend background
    color_t = color_t + (1.0 - alpha_t)[..., None] * bg

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        img = x.reshape(n_tiles_y, n_tiles_x, TILE, TILE, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            n_tiles_y * TILE, n_tiles_x * TILE, c)
        return img[:H, :W]

    color = untile(color_t)
    depth = untile(depth_t[..., None])[..., 0]
    alpha = untile(alpha_t[..., None])[..., 0]

    # n_touched: pixels-contributed count per Gaussian
    flat_ids = jnp.where(tile_ids >= 0, tile_ids, N).reshape(-1)
    n_touched = jax.ops.segment_sum(
        touched_t.reshape(-1), flat_ids, num_segments=N + 1)[:-1]
    n_touched = jax.lax.stop_gradient(n_touched)

    radii = jax.lax.stop_gradient(jnp.where(visible, radius, 0.0))
    return RenderOutput(color=color, depth=depth, alpha=alpha, radii=radii,
                        n_touched=n_touched, means2d=means2d)


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
    w_c = jnp.where(T_before < T_MIN, 0.0, w_c)
    color = (w_c[..., None] * col[None]).sum(1)
    depth = (w_c * dep[None]).sum(1)
    a_acc = w_c.sum(1)
    color = color + (1 - a_acc)[:, None] * bg
    return (color.reshape(H, W, 3), depth.reshape(H, W),
            a_acc.reshape(H, W))
