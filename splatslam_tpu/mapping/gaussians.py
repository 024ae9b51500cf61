"""Gaussian map storage + optimizer, fixed-capacity and jit-friendly.

TPU-native redesign of the reference GaussianModel
(thirdparty/gaussian_splatting/scene/gaussian_model.py:34-743). The
reference reallocates parameter tensors and performs "optimizer surgery"
on torch.optim.Adam state at every densify/prune/deform
(gaussian_model.py:488-637). Here the map lives in fixed-capacity padded
arrays with an `alive` mask:

  * densify writes clones/splits into free slots (pure scatter, no
    reallocation, no recompile),
  * prune clears the mask,
  * the Adam moments are plain arrays surgically zeroed at touched slots —
    bit-identical semantics to the reference's replace/cat/prune_tensor
    helpers, without rebuilding optimizer state objects,
  * capacity grows by doubling (host-side, rare, the only recompile).

Parameters and activations mirror the reference exactly: xyz,
features_dc/rest (SH), log-scaling, wxyz rotation, logit opacity
(gaussian_model.py:39-66), per-Gaussian unique_kfIDs / n_obs for the
SLAM-specific deformation and pruning.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

C0 = 0.28209479177387814  # SH DC basis


def rgb_to_sh(rgb):
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    return sh * C0 + 0.5


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


PARAM_NAMES = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """All per-Gaussian arrays, capacity-padded."""
    xyz: jnp.ndarray          # (C, 3)
    f_dc: jnp.ndarray         # (C, 3) DC SH coefficients
    f_rest: jnp.ndarray       # (C, R, 3) higher-order SH
    opacity: jnp.ndarray      # (C, 1) logit
    scaling: jnp.ndarray      # (C, 3) log
    rotation: jnp.ndarray     # (C, 4) wxyz
    alive: jnp.ndarray        # (C,) bool
    kf_id: jnp.ndarray        # (C,) int32 anchoring keyframe
    n_obs: jnp.ndarray        # (C,) int32
    max_radii2D: jnp.ndarray  # (C,)
    grad_accum: jnp.ndarray   # (C,) accumulated ||d means2d||
    denom: jnp.ndarray        # (C,)
    # Adam moments per parameter
    m_xyz: jnp.ndarray
    v_xyz: jnp.ndarray
    m_f_dc: jnp.ndarray
    v_f_dc: jnp.ndarray
    m_f_rest: jnp.ndarray
    v_f_rest: jnp.ndarray
    m_opacity: jnp.ndarray
    v_opacity: jnp.ndarray
    m_scaling: jnp.ndarray
    v_scaling: jnp.ndarray
    m_rotation: jnp.ndarray
    v_rotation: jnp.ndarray


def make_state(capacity: int, sh_degree: int = 0) -> GaussianState:
    R = (sh_degree + 1) ** 2 - 1
    z = lambda *s: jnp.zeros(s, jnp.float32)
    st = GaussianState(
        xyz=z(capacity, 3), f_dc=z(capacity, 3), f_rest=z(capacity, R, 3),
        opacity=z(capacity, 1), scaling=z(capacity, 3),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (capacity, 1)),
        alive=jnp.zeros(capacity, bool),
        kf_id=-jnp.ones(capacity, jnp.int32),
        n_obs=jnp.zeros(capacity, jnp.int32),
        max_radii2D=z(capacity), grad_accum=z(capacity), denom=z(capacity),
        m_xyz=z(capacity, 3), v_xyz=z(capacity, 3),
        m_f_dc=z(capacity, 3), v_f_dc=z(capacity, 3),
        m_f_rest=z(capacity, R, 3), v_f_rest=z(capacity, R, 3),
        m_opacity=z(capacity, 1), v_opacity=z(capacity, 1),
        m_scaling=z(capacity, 3), v_scaling=z(capacity, 3),
        m_rotation=z(capacity, 4), v_rotation=z(capacity, 4),
    )
    return st


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def get_scaling(st):
    return jnp.exp(st.scaling)


def get_opacity(st):
    return jax.nn.sigmoid(st.opacity)


def get_rotation(st):
    return st.rotation / jnp.linalg.norm(st.rotation, axis=-1, keepdims=True)


def get_colors_dc(st):
    """Degree-0 color (reference sh_utils SH2RGB of the DC term)."""
    return jnp.clip(sh_to_rgb(st.f_dc), 0.0, None)


def num_alive(st) -> int:
    return int(jnp.sum(st.alive))


# ---------------------------------------------------------------------------
# KNN scale init (simple-knn distCUDA2 equivalent)
# ---------------------------------------------------------------------------

@jax.jit
def mean_sq_dist_3nn(points, valid):
    """Mean squared distance to the 3 nearest neighbors within the batch
    (reference gaussian_model.py:194-200 via simple_knn.distCUDA2)."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, -1)
    big = jnp.float32(1e12)
    n = points.shape[0]
    d2 = d2 + big * jnp.eye(n)
    d2 = jnp.where(valid[None, :], d2, big)
    neg_top4, _ = jax.lax.top_k(-d2, 3)
    d3 = -neg_top4
    # fewer than 3 valid neighbors: averaging the 1e12 sentinel in would
    # give exp(~11) world-sized scales — average only real neighbors,
    # fall back to a tiny scale when a point has none
    ok = d3 < 0.5 * big
    cnt = ok.sum(-1)
    mean = jnp.sum(jnp.where(ok, d3, 0.0), -1) / jnp.clip(cnt, 1)
    return jnp.where(cnt > 0, mean, 1e-6)


# ---------------------------------------------------------------------------
# anchoring: unproject RGBD, random downsample, scale init
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("downsample", "max_new"))
def anchor_points(rng, image, depth, w2c, intrinsics, downsample: int,
                  point_size, max_new: int):
    """New Gaussian candidates from a keyframe (gaussian_model.py:107-219,
    open3d unprojection + random_down_sample replaced by direct math).

    Returns dict of padded (max_new, …) arrays + count + valid mask.
    Jitted (statics: downsample/max_new; point_size traced — it may be a
    device median) — eagerly this was ~20 dispatches per keyframe.
    """
    H, W = depth.shape
    fx, fy, cx, cy = intrinsics
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    z = depth.reshape(-1)
    sel_p = jax.random.uniform(rng, (H * W,)) < (1.0 / downsample)
    valid = (z > 1e-6) & sel_p

    X = (xs.reshape(-1) - cx) / fx * z
    Y = (ys.reshape(-1) - cy) / fy * z
    pts_cam = jnp.stack([X, Y, z], -1)
    c2w = jnp.linalg.inv(w2c)
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    cols = image.reshape(-1, 3)

    # compact the selected points to the front, pad to max_new
    order = jnp.argsort(~valid)  # valid first (stable)
    idx = order[:max_new]
    ok = valid[idx]
    pts = pts[idx]
    cols = cols[idx]

    dist2 = jnp.clip(mean_sq_dist_3nn(pts, ok), 1e-7) * point_size
    scales = 0.5 * jnp.log(dist2)[:, None].repeat(3, axis=1)  # log sqrt
    count = jnp.sum(ok.astype(jnp.int32))
    return dict(xyz=pts, color=cols, scales=scales, valid=ok, count=count)


@jax.jit
def insert_points(st: GaussianState, new, kf_id):
    """Write anchored points into free slots (cat_tensors_to_optimizer
    equivalent: new slots start with zero Adam moments)."""
    C = st.xyz.shape[0]
    # argsort(alive): False(0) sorts before True(1) → free slots first
    slot_of_free = jnp.argsort(st.alive)
    n_new = new["valid"].shape[0]
    new_rank = jnp.cumsum(new["valid"]) - 1
    target = slot_of_free[jnp.clip(new_rank, 0, C - 1)]
    write = new["valid"] & (new_rank < jnp.sum(~st.alive))
    tgt = jnp.where(write, target, C)                # C = drop

    def scat(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        out = jnp.concatenate([arr, pad], 0)
        out = out.at[tgt].set(vals.astype(arr.dtype), mode="drop")
        return out[:C]

    st = dataclasses.replace(
        st,
        xyz=scat(st.xyz, new["xyz"]),
        f_dc=scat(st.f_dc, rgb_to_sh(new["color"])),
        f_rest=scat(st.f_rest, jnp.zeros((n_new,) + st.f_rest.shape[1:])),
        opacity=scat(st.opacity, jnp.zeros((n_new, 1))),  # sigmoid(0)=0.5
        scaling=scat(st.scaling, new["scales"]),
        rotation=scat(st.rotation, jnp.tile(jnp.asarray([1.0, 0, 0, 0]),
                                            (n_new, 1))),
        alive=scat(st.alive, jnp.ones(n_new, bool)),
        kf_id=scat(st.kf_id, jnp.full((n_new,), kf_id, jnp.int32)),
        n_obs=scat(st.n_obs, jnp.zeros(n_new, jnp.int32)),
        max_radii2D=scat(st.max_radii2D, jnp.zeros(n_new)),
        grad_accum=scat(st.grad_accum, jnp.zeros(n_new)),
        denom=scat(st.denom, jnp.zeros(n_new)),
        m_xyz=scat(st.m_xyz, jnp.zeros((n_new, 3))),
        v_xyz=scat(st.v_xyz, jnp.zeros((n_new, 3))),
        m_f_dc=scat(st.m_f_dc, jnp.zeros((n_new, 3))),
        v_f_dc=scat(st.v_f_dc, jnp.zeros((n_new, 3))),
        m_f_rest=scat(st.m_f_rest, jnp.zeros((n_new,) + st.f_rest.shape[1:])),
        v_f_rest=scat(st.v_f_rest, jnp.zeros((n_new,) + st.f_rest.shape[1:])),
        m_opacity=scat(st.m_opacity, jnp.zeros((n_new, 1))),
        v_opacity=scat(st.v_opacity, jnp.zeros((n_new, 1))),
        m_scaling=scat(st.m_scaling, jnp.zeros((n_new, 3))),
        v_scaling=scat(st.v_scaling, jnp.zeros((n_new, 3))),
        m_rotation=scat(st.m_rotation, jnp.zeros((n_new, 4))),
        v_rotation=scat(st.v_rotation, jnp.zeros((n_new, 4))),
    )
    return st


def grow_capacity(st: GaussianState, factor: int = 2) -> GaussianState:
    """Double capacity (host-side; the only recompile trigger)."""
    C = st.xyz.shape[0]
    import sys
    print(f"[gaussians] capacity {C} -> {C * factor}: every mapping "
          "kernel recompiles for the new bucket (one-time, cached "
          "persistently; minutes on a remote-compile TPU tunnel)",
          file=sys.stderr, flush=True)
    extra = make_state(C * (factor - 1), sh_degree=0)
    # match f_rest rank
    R = st.f_rest.shape[1]
    if R != extra.f_rest.shape[1]:
        z = jnp.zeros((C * (factor - 1), R, 3))
        extra = dataclasses.replace(extra, f_rest=z, m_f_rest=z, v_f_rest=z)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], 0), st, extra)


# ---------------------------------------------------------------------------
# Adam with per-group learning rates (torch.optim.Adam(eps=1e-15) parity)
# ---------------------------------------------------------------------------

@jax.jit
def adam_step(st: GaussianState, grads: dict, lrs: dict, step: jnp.ndarray,
              b1=0.9, b2=0.999, eps=1e-15):
    """One Adam step on all Gaussian parameters. grads keyed by PARAM_NAMES;
    lrs likewise (scalars)."""
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    updates = {}
    for name in PARAM_NAMES:
        g = grads[name]
        g = jnp.where(st.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
        m = getattr(st, f"m_{name}")
        v = getattr(st, f"v_{name}")
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        upd = lrs[name] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        updates[name] = upd
        st = dataclasses.replace(st, **{f"m_{name}": m, f"v_{name}": v})
    st = dataclasses.replace(
        st,
        xyz=st.xyz - updates["xyz"],
        f_dc=st.f_dc - updates["f_dc"],
        f_rest=st.f_rest - updates["f_rest"],
        opacity=st.opacity - updates["opacity"],
        scaling=st.scaling - updates["scaling"],
        rotation=st.rotation - updates["rotation"],
    )
    return st


def xyz_lr(step, lr_init, lr_final, lr_delay_mult, max_steps):
    """Exponential xyz schedule (reference general_utils
    get_expon_lr_func). The reference only applies the sin delay ramp
    when lr_delay_steps > 0 — the mapper never sets delay steps, so
    delay_rate is 1.0 (the former always-on ramp suppressed the xyz lr
    for the first 1% of max_steps, covering most of map init)."""
    del lr_delay_mult  # kept for signature parity; unused at delay_steps=0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


# ---------------------------------------------------------------------------
# densify / prune / opacity resets (gaussian_model.py:382-736)
# ---------------------------------------------------------------------------

def _zero_moments(st, slots_mask):
    """Zero Adam moments at masked slots (replace_tensor_to_optimizer)."""
    upd = {}
    for name in PARAM_NAMES:
        for pre in ("m_", "v_"):
            arr = getattr(st, pre + name)
            msk = slots_mask.reshape((-1,) + (1,) * (arr.ndim - 1))
            upd[pre + name] = jnp.where(msk, 0.0, arr)
    return dataclasses.replace(st, **upd)






@partial(jax.jit, static_argnames=("N",))
def densify_and_prune(st: GaussianState, rng, max_grad, min_opacity, extent,
                      max_screen_size, percent_dense=0.01, N: int = 2):
    """Clone + split + prune (gaussian_model.py:639-736), in-place on the
    padded arrays. Splits go to free slots; overflow beyond capacity is
    dropped (caller grows capacity when occupancy is high)."""
    grads = jnp.where(st.denom > 0, st.grad_accum / st.denom, 0.0)
    scal = get_scaling(st)
    smax = scal.max(-1)

    # --- clone: small gaussians with large view-space gradient
    clone_mask = st.alive & (grads >= max_grad) & \
        (smax <= percent_dense * extent)
    # --- split: large gaussians with large gradient
    split_mask = st.alive & (grads >= max_grad) & \
        (smax > percent_dense * extent)

    C = st.xyz.shape[0]

    # children: N copies per selected parent (clones keep params; splits
    # sample around the parent and shrink scale by 0.8N)
    parent_mask = clone_mask | split_mask
    parent_idx = jnp.nonzero(parent_mask, size=C, fill_value=C)[0]
    is_parent = parent_idx < C
    parent_idx_c = jnp.clip(parent_idx, 0, C - 1)

    def gather(a):
        return a[parent_idx_c]

    # one child per parent for clone; N children per parent for split —
    # realized as N child batches, masking clone batches beyond the first
    children = []
    key = rng
    for b in range(N):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (C, 3)) * gather(scal)
        q = gather(get_rotation(st))
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = jnp.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], -1).reshape(-1, 3, 3)
        split_xyz = gather(st.xyz) + jnp.einsum("nij,nj->ni", R, noise)
        split_scaling = jnp.log(gather(scal) / (0.8 * N))
        is_split = gather(split_mask)
        is_clone = gather(clone_mask) & (b == 0)
        child_valid = is_parent & (is_split | is_clone)
        children.append(dict(
            xyz=jnp.where(is_split[:, None], split_xyz, gather(st.xyz)),
            scaling=jnp.where(is_split[:, None], split_scaling,
                              gather(st.scaling)),
            f_dc=gather(st.f_dc), f_rest=gather(st.f_rest),
            opacity=gather(st.opacity), rotation=gather(st.rotation),
            kf_id=gather(st.kf_id), n_obs=gather(st.n_obs),
            valid=child_valid))

    cat = {k: jnp.concatenate([c[k] for c in children], 0)
           for k in children[0]}

    # split parents are pruned (replaced by children); clone parents stay
    st = dataclasses.replace(st, alive=st.alive & ~split_mask)
    free = ~st.alive
    slot_of_free = jnp.argsort(st.alive)
    n_free = jnp.sum(free)
    rank = jnp.cumsum(cat["valid"]) - 1
    tgt = jnp.where(cat["valid"] & (rank < n_free),
                    slot_of_free[jnp.clip(rank, 0, C - 1)], C)

    def scat(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        out = jnp.concatenate([arr, pad], 0)
        out = out.at[tgt].set(vals.astype(arr.dtype), mode="drop")
        return out[:C]

    newly = jnp.zeros(C + 1, bool).at[tgt].set(cat["valid"],
                                               mode="drop")[:C]
    st = dataclasses.replace(
        st,
        xyz=scat(st.xyz, cat["xyz"]),
        f_dc=scat(st.f_dc, cat["f_dc"]),
        f_rest=scat(st.f_rest, cat["f_rest"]),
        opacity=scat(st.opacity, cat["opacity"]),
        scaling=scat(st.scaling, cat["scaling"]),
        rotation=scat(st.rotation, cat["rotation"]),
        kf_id=scat(st.kf_id, cat["kf_id"]),
        n_obs=scat(st.n_obs, cat["n_obs"]),
        alive=st.alive | newly)
    st = _zero_moments(st, newly)
    st = dataclasses.replace(
        st, max_radii2D=jnp.where(newly, 0.0, st.max_radii2D))

    # --- prune
    prune = st.alive & (get_opacity(st)[:, 0] < min_opacity)
    if max_screen_size is not None:
        big_vs = st.max_radii2D > max_screen_size
        big_ws = get_scaling(st).max(-1) > 0.1 * extent
        prune = prune | (st.alive & (big_vs | big_ws))
    st = dataclasses.replace(
        st, alive=st.alive & ~prune,
        grad_accum=jnp.zeros_like(st.grad_accum),
        denom=jnp.zeros_like(st.denom))
    return st


@jax.jit
def reset_opacity(st: GaussianState, value=0.01):
    """Reset opacities to min(opacity, `value`) (gaussian_model.py
    reset_opacity: inverse_sigmoid(min(get_opacity, 0.01)) — it never
    RAISES an opacity, so near-transparent floaters stay prunable)."""
    cap = float(np.log(value / (1 - value)))    # logit of `value`
    new_o = jnp.minimum(st.opacity, cap)
    st = dataclasses.replace(st, opacity=new_o)
    return _zero_moments_only(st, "opacity")


@jax.jit
def reset_opacity_nonvisible(st: GaussianState, visible_any):
    """Reset opacity of non-visible Gaussians to 0.4
    (gaussian_model.py:387-395)."""
    cur = get_opacity(st)
    tgt = jnp.where(visible_any[:, None], cur, jnp.full_like(cur, 0.4))
    st = dataclasses.replace(st, opacity=inverse_sigmoid(
        jnp.clip(tgt, 1e-4, 1 - 1e-4)))
    return _zero_moments_only(st, "opacity")


def _zero_moments_only(st, name):
    return dataclasses.replace(
        st, **{f"m_{name}": jnp.zeros_like(getattr(st, f"m_{name}")),
               f"v_{name}": jnp.zeros_like(getattr(st, f"v_{name}"))})


@jax.jit
def prune_by_mask(st: GaussianState, mask):
    """prune_points(mask) parity: kill masked Gaussians."""
    return dataclasses.replace(st, alive=st.alive & ~mask)


# ---------------------------------------------------------------------------
# PLY I/O (plyfile-free)
# ---------------------------------------------------------------------------

def save_ply(st: GaussianState, path: str):
    """Binary little-endian PLY matching the reference attribute list
    (gaussian_model.py:331-380) so external 3DGS viewers load it."""
    alive = np.asarray(st.alive)
    xyz = np.asarray(st.xyz)[alive]
    n = xyz.shape[0]
    f_dc = np.asarray(st.f_dc)[alive]
    # channel-major flattening (n, 3, R) → f_rest_k with k = c*R + r:
    # the reference PLY layout and load_ply both expect it; row-major
    # flattening scrambled SH coefficients across channels for R > 0
    f_rest = np.asarray(st.f_rest)[alive].transpose(0, 2, 1).reshape(
        n, st.f_rest.shape[1] * 3)
    opa = np.asarray(st.opacity)[alive]
    scal = np.asarray(st.scaling)[alive]
    rot = np.asarray(st.rotation)[alive]
    normals = np.zeros_like(xyz)

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scal.shape[1])]
             + [f"rot_{i}" for i in range(rot.shape[1])])
    data = np.concatenate([xyz, normals, f_dc, f_rest, opa, scal, rot],
                          axis=1).astype("<f4")
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(data.tobytes())


def load_ply(path: str, capacity: int | None = None) -> GaussianState:
    """Load a (reference-format) Gaussian PLY into a padded state."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header
                 if l.startswith("element vertex"))
        props = [l.split()[-1] for l in header if l.startswith("property")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(props))
    col = {p: data[:, i] for i, p in enumerate(props)}
    n_rest = sum(1 for p in props if p.startswith("f_rest_"))
    R = max(n_rest // 3, 0)
    if capacity is None:
        capacity = max(2 * n, 1024)
    st = make_state(capacity, sh_degree=int(np.sqrt(R + 1)) - 1 if R else 0)
    sl = slice(0, n)
    st = dataclasses.replace(
        st,
        xyz=st.xyz.at[sl].set(np.stack([col["x"], col["y"], col["z"]], -1)),
        f_dc=st.f_dc.at[sl].set(
            np.stack([col[f"f_dc_{i}"] for i in range(3)], -1)),
        f_rest=(st.f_rest.at[sl].set(
            np.stack([col[f"f_rest_{i}"] for i in range(n_rest)],
                     -1).reshape(n, 3, R).transpose(0, 2, 1))
            if n_rest else st.f_rest),
        opacity=st.opacity.at[sl].set(col["opacity"][:, None]),
        scaling=st.scaling.at[sl].set(
            np.stack([col[f"scale_{i}"] for i in range(3)], -1)),
        rotation=st.rotation.at[sl].set(
            np.stack([col[f"rot_{i}"] for i in range(4)], -1)),
        alive=st.alive.at[sl].set(True),
        kf_id=st.kf_id.at[sl].set(0))
    return st
