"""Pure-JAX SE(3) / Sim(3) Lie-group operations on quaternion 7/8-vectors.

TPU-native replacement for the `lietorch` CUDA extension used by the
reference (called from thirdparty/glorie_slam/depth_video.py:173,237,328,
geom/projective_ops.py:18,117-134, geom/ba.py:45, trajectory_filler.py:62-95).

Storage layout matches lietorch so pose buffers are interchangeable:
    SE3  : [tx, ty, tz, qx, qy, qz, qw]            (7 floats)
    Sim3 : [tx, ty, tz, qx, qy, qz, qw, s]         (8 floats, s = scale)

Tangent (manifold) layout: [tau(3), phi(3)] translation-first, and for Sim3
[tau(3), phi(3), sigma]. Retraction is LEFT multiplication:
    retr(g, xi) = exp(xi) ∘ g
matching the CUDA retraction in the reference
(thirdparty/glorie_slam/lib/droid_kernels.cu pose_retr / retrSE3).

Group action on homogeneous 4-points X = (x, y, z, d) (d = inverse-depth
homogeneous coordinate, as produced by pinhole inverse projection):
    g * X = (R @ (x,y,z) + d * t, d)

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap/grad-safe (Taylor-series fallbacks near the identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """SE3 identity 7-vectors with the given leading shape."""
    out = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return out.at[..., 6].set(1.0)


# ---------------------------------------------------------------------------
# quaternion helpers (xyzw storage, Hamilton convention)
# ---------------------------------------------------------------------------

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, both stored as (..., 4) xyzw."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors v by unit quaternions q (xyzw)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) xyzw → rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4) xyzw.

    Branch-free Shepperd's method (numerically stable for all rotations).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # four candidate constructions, pick the best-conditioned per element
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    # candidates[k] is (w, x, y, z) scaled by 4*q_k
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4) [cand, wxyz]
    diag = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    best = jnp.argmax(diag, axis=-1)
    cand = jnp.take_along_axis(
        cands, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    # wxyz → xyzw and normalize
    q = jnp.concatenate([cand[..., 1:4], cand[..., 0:1]], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: qw >= 0
    return q * jnp.sign(q[..., 3:4] + _EPS)


# ---------------------------------------------------------------------------
# SO(3) exp/log with Taylor fallbacks
# ---------------------------------------------------------------------------

def _sinc(x):
    """sin(x)/x, safe at 0."""
    return jnp.where(jnp.abs(x) < 1e-4, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x))


def _safe_norm(v, axis=-1, keepdims=False):
    """‖v‖ with a finite gradient at v = 0 (needed so autodiff through
    exp/log at the identity — e.g. rasterizer pose deltas — stays NaN-free)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(sq + 1e-24)


def so3_exp_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector (..., 3) → unit quaternion (..., 4) xyzw."""
    theta = _safe_norm(phi, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-4
    k = jnp.where(small, 0.5 - theta * theta / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, theta))
    qv = k * phi
    qw = jnp.cos(half)
    return jnp.concatenate([qv, qw], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) xyzw → rotation vector (..., 3)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # force positive hemisphere for a unique log
    sign = jnp.sign(qw + _EPS)
    qv = qv * sign
    qw = qw * sign
    n = _safe_norm(qv, keepdims=True)
    half = jnp.arctan2(n, qw)
    small = n < 1e-6
    k = jnp.where(small, 2.0 / jnp.clip(qw, _EPS), 2.0 * half / jnp.where(small, 1.0, n))
    return k * qv


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) → skew-symmetric (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V(phi) of SO(3), (..., 3, 3)."""
    theta = _safe_norm(phi)
    W = _hat(phi)
    W2 = W @ W
    small = theta < 1e-4
    t = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(t)) / t**2)
    B = jnp.where(small, 1.0 / 6.0 - theta**2 / 120.0, (t - jnp.sin(t)) / t**3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def _so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta = _safe_norm(phi)
    W = _hat(phi)
    W2 = W @ W
    small = theta < 1e-4
    t = jnp.where(small, 1.0, theta)
    half = 0.5 * t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta**2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / t**2,
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I - 0.5 * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    """Compose SE3 7-vectors: g1 ∘ g2."""
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    q = quat_mul(q1, q2)
    t = t1 + quat_rotate(q1, t2)
    return jnp.concatenate([t, q], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_conj(q)
    ti = -quat_rotate(qi, t)
    return jnp.concatenate([ti, qi], axis=-1)


def act(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 to homogeneous 4-points (x, y, z, d): (R xyz + d t, d)."""
    t, q = g[..., :3], g[..., 3:7]
    xyz, d = X[..., :3], X[..., 3:4]
    return jnp.concatenate([quat_rotate(q, xyz) + d * t, d], axis=-1)


def act3(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 to ordinary 3-points."""
    t, q = g[..., :3], g[..., 3:7]
    return quat_rotate(q, p) + t


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se3 tangent (..., 6) [tau, phi] → SE3 7-vec."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, tau)
    return jnp.concatenate([t, q], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """SE3 7-vec → se3 tangent (..., 6) [tau, phi]."""
    t, q = g[..., :3], g[..., 3:7]
    phi = so3_log(q)
    Vinv = _so3_left_jacobian_inv(phi)
    tau = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction: exp(xi) ∘ g (matches the reference CUDA pose_retr)."""
    return mul(exp(xi), g)


def adjoint(g: jnp.ndarray) -> jnp.ndarray:
    """Adjoint matrix Adj(g) (..., 6, 6) for tangent order [tau, phi]."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    tR = _hat(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def adjT_apply(g: jnp.ndarray, Jrows: jnp.ndarray) -> jnp.ndarray:
    """Dual-adjoint transport of Jacobian row-covectors: Jrows @ Adj(g).

    Matches lietorch's `adjT` usage in the reference
    (thirdparty/glorie_slam/geom/projective_ops.py:132): for rows a of J,
    a ← Adj(g)ᵀ a, i.e. J ← J @ Adj(g).
    """
    return jnp.einsum("...kj,...ji->...ki", Jrows, adjoint(g))


def to_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """SE3 7-vec → homogeneous (..., 4, 4) matrix."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous (..., 4, 4) matrix → SE3 7-vec."""
    q = matrix_to_quat(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def from_matrix_np(T) -> "np.ndarray":
    """Host (numpy) version of from_matrix — for per-frame host logic
    where a device dispatch + fetch would cost a link round trip."""
    import numpy as np
    T = np.asarray(T)
    R = T[:3, :3]
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qw = (R[2, 1] - R[1, 2]) / s
        qx = 0.25 * s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qy = 0.25 * s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
        qz = 0.25 * s
    q = np.array([qx, qy, qz, qw])
    q = q / np.linalg.norm(q)
    return np.concatenate([T[:3, 3], q]).astype(np.float32)


def inv_matrix_np(g) -> "np.ndarray":
    """Host (numpy, batched) c2w 4×4 matrices from w2c SE3 7-vecs —
    to_matrix(inv(g)) without a device program + matrix-sized pull (the
    save/eval paths pull the raw (n, 7) vecs, 28 B per keyframe, and
    convert here)."""
    import numpy as np
    g = np.atleast_2d(np.asarray(g, np.float64))
    t, q = g[:, :3], g[:, 3:7]
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((g.shape[0], 3, 3))
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    out = np.tile(np.eye(4), (g.shape[0], 1, 1))
    # inv([R|t]) = [Rᵀ | -Rᵀt]
    out[:, :3, :3] = R.transpose(0, 2, 1)
    out[:, :3, 3] = -np.einsum("nji,nj->ni", R, t)
    return out.astype(np.float32)


def normalize(g: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (fp32 drift control)."""
    t, q = g[..., :3], g[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3)  — 8-vec [t, q, s]; tangent [tau, phi, sigma]
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    out = jnp.zeros(tuple(shape) + (8,), dtype=dtype)
    return out.at[..., 6].set(1.0).at[..., 7].set(1.0)


def sim3_mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    q = quat_mul(q1, q2)
    t = t1 + s1 * quat_rotate(q1, t2)
    return jnp.concatenate([t, q, s1 * s2], axis=-1)


def sim3_inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = quat_conj(q)
    si = 1.0 / s
    ti = -si * quat_rotate(qi, t)
    return jnp.concatenate([ti, qi, si], axis=-1)


def sim3_act(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply Sim3 to homogeneous 4-points (x, y, z, d): (s R xyz + d t, d)."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    xyz, d = X[..., :3], X[..., 3:4]
    return jnp.concatenate([s * quat_rotate(q, xyz) + d * t, d], axis=-1)


def _sim3_W(sigma: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) translation Jacobian W(σ, φ) = ∫₀¹ e^{uσ} e^{uΦ} du,
    so that sim3_exp translation t = W τ (lietorch Sim3 semantics;
    closed form as in Strasdat's Sophus, with Taylor fallbacks).

    With Φ = hat(φ), θ = ‖φ‖, s = e^σ:
        W = C·I + A·Φ + B·Φ²
        C = (s − 1)/σ
        A = (1 − s·cosθ + s·σ·sinc θ) / (σ² + θ²)
        B = (C − I₂)/θ²,   I₂ = (s(σ·cosθ + θ·sinθ) − σ) / (σ² + θ²)
    """
    theta = _safe_norm(phi)
    s = jnp.exp(sigma)
    Phi = _hat(phi)
    Phi2 = Phi @ Phi
    th2 = theta * theta
    sig2 = sigma * sigma
    den = sig2 + th2

    small_sig = jnp.abs(sigma) < 1e-4
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    C = jnp.where(small_sig, 1.0 + 0.5 * sigma + sig2 / 6.0,
                  (s - 1.0) / sig_safe)

    small_den = den < 1e-8
    den_safe = jnp.where(small_den, 1.0, den)
    A = jnp.where(
        small_den,
        0.5 + sigma / 3.0 - th2 / 24.0,
        (1.0 - s * jnp.cos(theta) + s * sigma * _sinc(theta)) / den_safe)

    I2 = (s * (sigma * jnp.cos(theta) + theta * jnp.sin(theta)) - sigma) \
        / den_safe
    small_th = th2 < 1e-8
    th2_safe = jnp.where(small_th, 1.0, th2)
    # θ→0 limit: B = ½∫₀¹ u² e^{uσ} du = (s(σ²−2σ+2) − 2)/(2σ³)
    B_small_th = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0 + sig2 / 20.0,
        (s * (sig2 - 2.0 * sigma + 2.0) - 2.0) / (2.0 * sig_safe ** 3))
    B = jnp.where(small_th, B_small_th, (C - I2) / th2_safe)

    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (C[..., None, None] * I + A[..., None, None] * Phi
            + B[..., None, None] * Phi2)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim3 tangent (..., 7) [tau, phi, sigma] → Sim3 8-vec [t, q, s]."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp_quat(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(sigma, phi)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def sim3_log(g: jnp.ndarray) -> jnp.ndarray:
    """Sim3 8-vec → sim3 tangent (..., 7) [tau, phi, sigma]."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7]
    phi = so3_log(q)
    sigma = jnp.log(s)
    W = _sim3_W(sigma, phi)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)


def sim3_retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction: exp(xi) ∘ g."""
    return sim3_mul(sim3_exp(xi), g)


def sim3_adjoint(g: jnp.ndarray) -> jnp.ndarray:
    """Adjoint matrix Adj(g) (..., 7, 7), tangent order [tau, phi, sigma]:
        [[ sR  hat(t)R  −t ]
         [ 0     R       0 ]
         [ 0     0       1 ]]
    satisfying exp(Adj(g) ξ) = g ∘ exp(ξ) ∘ g⁻¹."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7]
    R = quat_to_matrix(q)
    tR = _hat(t) @ R
    Z3 = jnp.zeros_like(R)
    z31 = jnp.zeros_like(t[..., None])
    top = jnp.concatenate([s[..., None, None] * R, tR, -t[..., None]], -1)
    mid = jnp.concatenate([Z3, R, z31], -1)
    one = jnp.ones_like(s)[..., None, None]
    bot = jnp.concatenate([jnp.zeros_like(mid[..., :1, :-1]), one], -1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def sim3_to_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """Sim3 8-vec → homogeneous (..., 4, 4) matrix [[sR, t], [0, 1]]."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    R = quat_to_matrix(q) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
