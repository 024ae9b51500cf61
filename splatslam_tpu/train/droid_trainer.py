"""Self-training for the DROID update operator on synthetic flow data.

The reference ships a pretrained `droid.pth` (not available in this
environment); this trainer produces a working tracker from scratch:
RAFT-style iterative flow refinement on procedurally generated scene
pairs with ground-truth correspondence (the same supervision family DROID
itself was trained with — flow + confidence, see DROID-SLAM).

Per step: sample a batch of frame pairs from random Synthetic scenes,
compute GT flow from GT depth + relative pose, then unroll K update
iterations:
    corr = lookup(corr_pyramid, coords)
    net, delta, weight = update(net, inp, corr, motion_features)
    coords += delta
with the standard exponentially-weighted flow loss, a confidence target
exp(-|err|) for the weight head, and a full-resolution flow loss through
the learned convex upsampler (trains GraphAgg's upmask head).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.droid_net import DroidNet, normalize_images
from ..ops import corr as corr_ops
from ..ops import lie, projective as pops
from ..ops.upsample import cvx_upsample
from ..datasets import Synthetic


def make_pair_batch(rng: np.random.RandomState, batch: int, H: int, W: int,
                    fx: float = 80.0):
    """Render `batch` frame pairs with GT flow at 1/8 resolution.

    Focal length and motion magnitude are sampled wide so the observed
    1/8-res flows span ~0.2-8 px — the range the tracker sees at the
    SLAM resolutions (a narrow motion range trains a net that predicts a
    constant small delta and never fires the keyframe gate)."""
    imgs1, imgs2, flows, valids = [], [], [], []
    h, w = H // 8, W // 8
    for _ in range(batch):
        fx_s = float(fx * (0.7 + 1.8 * rng.rand()))
        # Random position along the trajectory + random frame gap. Pairs
        # fixed at frames (0, 1) share ONE deterministic sin-phase: every
        # sample then has nearly the same motion DIRECTION, and the net
        # memorizes that prior instead of reading the correlation volume
        # (measured: train EPE 0.1 px, but 2-4 px at other trajectory
        # positions of the very same scene family).
        k0 = int(rng.randint(0, 60))
        # Gap distribution (r5): the pipeline correlates pairs well beyond
        # adjacent frames — frontend proximity edges span the window,
        # backend/loop edges pair keyframes >20 apart (reference
        # factor_graph.py:337-461). Training only at gaps 1-3 (rounds
        # <=4) made exactly those edges out-of-distribution: measured
        # ATE ablation showed online/loop BA HURTING (0.053 -> 0.131)
        # because their update targets were garbage. Mix: 40% gaps 1-3
        # (the admission/motion-filter regime), 45% gaps 1-10 (window
        # proximity edges), 15% full-period revisit pairs on a pendulum
        # trajectory (loop-closure regime: huge temporal gap, near-zero
        # true motion -> the net must predict ~zero delta with HIGH
        # confidence instead of hallucinating flow).
        u = rng.rand()
        loop_period = 0
        if u < 0.15:
            loop_period = int(24 + rng.randint(48))
            gap = loop_period
            k0 = int(rng.randint(0, 16))
        elif u < 0.55:
            gap = int(1 + rng.randint(3))
        else:
            gap = int(1 + rng.randint(10))
        syn = {"n_frames": k0 + gap + 1,
               "seed": int(rng.randint(1 << 30)),
               "motion_scale": float(0.5 + 9.5 * rng.rand())}
        if loop_period:
            syn["loop_period"] = loop_period
        cfg = {
            "dataset": "synthetic",
            "cam": {"H": H, "W": W, "fx": fx_s, "fy": fx_s,
                    "cx": W / 2 - 0.5,
                    "cy": H / 2 - 0.5, "H_out": H, "W_out": W,
                    "H_edge": 0, "W_edge": 0},
            "synthetic": syn,
        }
        ds = Synthetic(cfg)
        _, im1, d1, p1 = ds[k0]
        _, im2, _, p2 = ds[k0 + gap]
        imgs1.append(im1)
        imgs2.append(im2)
        # GT flow at 1/8 res from depth + relative pose
        off = 3
        d8 = d1[off::8, off::8][:h, :w]
        disp8 = np.where(d8 > 1e-6, 1.0 / np.maximum(d8, 1e-6), 0.0)
        w2c1 = np.linalg.inv(p1)
        w2c2 = np.linalg.inv(p2)
        poses = jnp.stack([lie.from_matrix(jnp.asarray(w2c1)),
                           lie.from_matrix(jnp.asarray(w2c2))])
        intr8 = jnp.asarray([fx_s / 8, fx_s / 8, (W / 2 - 0.5) / 8,
                             (H / 2 - 0.5) / 8])
        coords, valid = pops.projective_transform(
            poses[None], jnp.asarray(disp8)[None, None].repeat(2, 1),
            jnp.broadcast_to(intr8, (2, 4))[None],
            jnp.asarray([0]), jnp.asarray([1]))
        flows.append(np.asarray(coords[0, 0]))
        valids.append(np.asarray(valid[0, 0, ..., 0]))
    return (jnp.asarray(np.stack(imgs1)), jnp.asarray(np.stack(imgs2)),
            jnp.asarray(np.stack(flows)), jnp.asarray(np.stack(valids)))


def make_train_step(tx, iters: int = 4):
    """Build the jitted train step closing over the optimizer."""
    model = DroidNet()

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, img1, img2, flow_gt, valid):
        B, H, W, _ = img1.shape
        h, w = H // 8, W // 8
        coords0 = pops.coords_grid(h, w)

        def loss_fn(params):
            x = normalize_images(jnp.concatenate([img1, img2], 0))
            fmaps = model.apply({"params": params}, x,
                                method=DroidNet.features)
            f1, f2 = fmaps[:B], fmaps[B:]
            cn, ci = model.apply({"params": params}, normalize_images(img1),
                                 method=DroidNet.context)
            pyr = corr_ops.build_corr_pyramid(f1.astype(jnp.float32),
                                              f2.astype(jnp.float32))
            net = cn
            coords = jnp.broadcast_to(coords0, (B, h, w, 2))
            total = 0.0
            w_loss = 0.0
            vmask = valid[..., None]
            for k in range(iters):
                corr = corr_ops.lookup_pyramid(pyr, coords)
                # inference-matching motion features: [coords-coords0,
                # target-coords] with target == current coords (no GT leak)
                motn = jnp.concatenate(
                    [jnp.clip(coords - coords0, -64, 64),
                     jnp.zeros_like(coords)], -1)
                net, delta, weight = model.apply(
                    {"params": params}, net, ci, corr, motn,
                    method=DroidNet.update_step)
                coords = jax.lax.stop_gradient(coords) + delta
                err = jnp.abs(coords - flow_gt) * vmask
                gamma = 0.8 ** (iters - k - 1)
                total = total + gamma * err.mean()
                conf_target = jnp.exp(-jax.lax.stop_gradient(err))
                w_loss = w_loss + gamma * (jnp.abs(weight - conf_target)
                                           * vmask).mean()
            # full-res flow loss through the learned convex upsampler
            ix = jnp.arange(B, dtype=jnp.int32)
            eta, upmask = model.apply({"params": params}, net, ix, B,
                                      method=DroidNet.update_agg)
            up_flow = cvx_upsample(coords - coords0, upmask) * 8.0
            gt_up = jax.image.resize(
                (flow_gt - coords0) * 8.0, (B, H, W, 2), "bilinear")
            vup = jax.image.resize(vmask.astype(jnp.float32), (B, H, W, 1),
                                   "nearest")
            up_loss = (jnp.abs(up_flow - gt_up) * vup).mean()
            loss = total + 0.2 * w_loss + 0.1 * up_loss
            epe = (jnp.linalg.norm(coords - flow_gt, axis=-1)
                   * valid).sum() / jnp.clip(valid.sum(), 1)
            return loss, epe

        (loss, epe), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(loss=loss, epe=epe, gnorm=gnorm)

    return train_step


class _Prefetcher:
    """Host-side batch producer: overlaps procedural scene rendering
    (numpy, seconds per batch at 240x320) with the device step. Workers
    draw a geometry bucket per batch; the consumer pops ready batches.
    Determinism: each worker seeds from (seed, worker_id) — batch order
    is not reproducible across thread schedules, acceptable for this
    self-training use (the reference's torch DataLoader workers have the
    same property)."""

    def __init__(self, make_fn, buckets, seed, batch, n_workers=2, depth=4):
        import queue
        import threading
        self.q = queue.Queue(maxsize=depth)
        self.stop = threading.Event()

        def work(wid):
            rng = np.random.RandomState((seed * 97 + wid) % (1 << 31))
            while not self.stop.is_set():
                Hb, Wb, fxb = buckets[rng.randint(len(buckets))]
                item = make_fn(rng, batch, Hb, Wb, fxb)
                while not self.stop.is_set():
                    try:
                        self.q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self.threads = [threading.Thread(target=work, args=(w,), daemon=True)
                        for w in range(n_workers)]
        for t in self.threads:
            t.start()

    def get(self):
        return self.q.get()

    def close(self):
        self.stop.set()
        # drain so producers blocked on put() can observe stop
        try:
            while True:
                self.q.get_nowait()
        except Exception:
            pass
        # join before interpreter teardown: a worker mid-render at exit
        # dies inside jax dispatch ("FATAL: exception not rethrown")
        for t in self.threads:
            t.join(timeout=30.0)


# Geometry buckets for training: the tracker must be accurate at the
# resolutions the SLAM actually runs (240x320 @ fx~200 for the Synthetic
# bench, 340x600 @ fx~580 downscaled for Replica ~ similar 1/8-res flow
# stats). Training only at 96x128/fx<=144 (rounds 1-2) left the net with
# a ~0.45 px EPE floor at bench geometry — flows there are 2-3x larger
# than anything it saw.
FLOW_BUCKETS = ((96, 128, 80.0), (240, 320, 200.0))


class _Pool:
    """Pre-rendered batch pool: render `n_batches` per bucket ONCE, then
    cycle shuffled. The host is single-core here, so fresh per-step
    rendering (~1.5 s/batch vs a 14-44 ms device step) leaves the TPU
    >95% idle; a pool makes training device-bound. The procedural scene
    family is diverse (random seed/fx/motion per batch), so reuse across
    epochs behaves like ordinary multi-epoch training, not overfitting
    to a tiny fixed set."""

    def __init__(self, make_fn, buckets, seed, batch, n_batches,
                 log_every=20):
        rng = np.random.RandomState(seed)
        self.items = []
        for i in range(n_batches):
            Hb, Wb, fxb = buckets[i % len(buckets)]
            self.items.append(make_fn(rng, batch, Hb, Wb, fxb))
            if i % log_every == 0:
                print(f"pool render {i}/{n_batches}", flush=True)
        self.rng = rng
        self.order = []

    def get(self):
        if not self.order:
            self.order = list(self.rng.permutation(len(self.items)))
        return self.items[self.order.pop()]

    def close(self):
        pass


def train(steps=2000, batch=4, H=96, W=128, lr=2e-4, seed=0,
          ckpt_path="pretrained/droid_selftrained.msgpack", log_every=25,
          params=None, buckets=None, iters=8, pool=0):
    """Train and save params (flax serialization msgpack).

    pool > 0: pre-render that many batches (cycled shuffled) instead of
    streaming fresh batches through the prefetcher — see _Pool."""
    from flax import serialization
    from ..models.weights import init_params

    rng = np.random.RandomState(seed)
    if params is None:
        params = init_params(jax.random.PRNGKey(seed), H=H, W=W)
    # Clipping semantics deviate from the reference DELIBERATELY: the
    # reference registers a backward hook that zeroes per-ELEMENT grads
    # with |g| > 0.01 (and NaNs) inside the update module
    # (glorie_slam/modules/droid_net/clipping.py:19-40) — a remedy for
    # exploding BA backprop on its training rig, tuned to its scale and
    # unroll depth. For a from-scratch net, global-norm clipping is the
    # standard choice: it preserves gradient direction instead of
    # flattening any step where many elements exceed a fixed 0.01 cut.
    # The two rules are NOT equivalent training dynamics; if a converted
    # reference checkpoint is ever fine-tuned here, revisit.
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps,
                                                             0.05)))
    opt_state = tx.init(params)
    step_fn = make_train_step(tx, iters=iters)
    history = []
    if buckets is None:
        buckets = [(H, W, 80.0)]
    if pool:
        pre = _Pool(make_pair_batch, buckets, seed, batch, pool)
    else:
        pre = _Prefetcher(make_pair_batch, buckets, seed, batch)

    def save(p):
        if not ckpt_path:
            return
        import os
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
        with open(ckpt_path, "wb") as f:
            f.write(serialization.to_bytes(p))
        print(f"saved {ckpt_path}", flush=True)

    try:
        for step in range(steps):
            img1, img2, flow, valid = pre.get()
            params, opt_state, m = step_fn(params, opt_state, img1, img2,
                                           flow, valid)
            if step % log_every == 0 or step == steps - 1:
                print(f"step {step}: loss {float(m['loss']):.4f} "
                      f"epe {float(m['epe']):.3f} px "
                      f"({img1.shape[1]}x{img1.shape[2]}) "
                      f"gnorm {float(m['gnorm']):.2f}", flush=True)
                history.append(float(m["epe"]))
            if step and step % 500 == 0:
                save(jax.device_get(params))
    finally:
        pre.close()
    save(params)
    return params, history


def load_selftrained(path: str):
    from flax import serialization
    from ..models.weights import init_params
    template = init_params()
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------------
# Stage 2: training THROUGH the differentiable BA layer (DROID's actual
# training signal — pose/depth supervision after the solver). Reference:
# the droid.pth shipped by the reference was trained this way; flow-only
# pretraining (above) gives a tracker whose weight/damping heads have
# never seen how the solver uses them.
# ---------------------------------------------------------------------------

def seq_edges(N: int, r: int = 2):
    """Neighborhood edge set over an N-frame training sequence (both
    directions, |i-j| <= r — the frontend's add_neighborhood_factors)."""
    ii, jj = [], []
    for i in range(N):
        for j in range(N):
            if i != j and abs(i - j) <= r:
                ii.append(i)
                jj.append(j)
    return np.asarray(ii, np.int32), np.asarray(jj, np.int32)


def make_seq_batch(rng: np.random.RandomState, batch: int, N: int,
                   H: int, W: int, fx: float = 80.0):
    """`batch` synthetic N-frame sequences with GT w2c poses + 1/8 disps."""
    h, w = H // 8, W // 8
    imgs_b, disps_b, poses_b, intr_b = [], [], [], []
    for _ in range(batch):
        fx_s = float(fx * (0.7 + 1.8 * rng.rand()))
        # random trajectory start: N-frame windows fixed at frame 0 all
        # share one sin-phase (see make_pair_batch)
        k0 = int(rng.randint(0, 60))
        # frame stride 1-3 (r5): production sequences are KEYFRAMES
        # (median admission gap ~2 on the bench scene), so the solver
        # must be accurate at keyframe baselines, not only consecutive
        # frames
        stride = int(1 + rng.randint(3))
        cfg = {
            "dataset": "synthetic",
            "cam": {"H": H, "W": W, "fx": fx_s, "fy": fx_s,
                    "cx": W / 2 - 0.5, "cy": H / 2 - 0.5,
                    "H_out": H, "W_out": W, "H_edge": 0, "W_edge": 0},
            "synthetic": {"n_frames": k0 + (N - 1) * stride + 1,
                          "seed": int(rng.randint(1 << 30)),
                          "motion_scale": float(0.5 + 9.5 * rng.rand())},
        }
        ds = Synthetic(cfg)
        imgs, disps, poses = [], [], []
        off = 3
        for k in range(N):
            _, im, d, c2w = ds[k0 + k * stride]
            imgs.append(im)
            d8 = d[off::8, off::8][:h, :w]
            disps.append(np.where(d8 > 1e-6, 1.0 / np.maximum(d8, 1e-6),
                                  0.0))
            poses.append(np.asarray(
                lie.from_matrix(jnp.asarray(np.linalg.inv(c2w)))))
        imgs_b.append(np.stack(imgs))
        disps_b.append(np.stack(disps).astype(np.float32))
        poses_b.append(np.stack(poses).astype(np.float32))
        intr_b.append([fx_s / 8, fx_s / 8, (W / 2 - 0.5) / 8,
                       (H / 2 - 0.5) / 8])
    return (jnp.asarray(np.stack(imgs_b)), jnp.asarray(np.stack(disps_b)),
            jnp.asarray(np.stack(poses_b)),
            jnp.asarray(np.asarray(intr_b, np.float32)))


def make_dba_train_step(tx, N: int = 7, iters: int = 8, gamma: float = 0.9,
                        w_pose: float = 10.0, w_disp: float = 0.05,
                        w_flow: float = 0.05):
    """Jitted train step unrolling GRU-update + 2-iteration DBA rounds.

    Protocol (DROID-SLAM training): poses start at identity (gauge fixed
    by freezing pose 0 — t0=1 in the plan), disparities start at 1; each
    round runs the learned update then the differentiable solver
    (ops/ba.py dba — plain JAX, so pose/depth gradients flow back into
    the delta/weight/eta heads). Supervision after every round:
    geodesic pose error, disparity L1 (pins the monocular scale), and
    flow-to-GT L1 on the round's target."""
    from ..ops.ba import make_edge_plan, dba

    model = DroidNet()
    ii_np, jj_np = seq_edges(N)
    plan = make_edge_plan(ii_np, jj_np, t0=1, t1=N)
    ii = jnp.asarray(ii_np)
    jj = jnp.asarray(jj_np)
    uniq, inv = np.unique(ii_np, return_inverse=True)
    ix = jnp.asarray(inv.astype(np.int32))
    Mk = len(uniq)   # == N for a neighborhood graph

    def scene_loss(params, imgs, disps_gt, poses_gt, intr8):
        h, w = disps_gt.shape[-2:]
        coords0 = pops.coords_grid(h, w)
        x = normalize_images(imgs)
        fmaps = model.apply({"params": params}, x, method=DroidNet.features)
        cn, ci = model.apply({"params": params}, x,
                             method=DroidNet.context)
        pyr = corr_ops.build_fmap_pyramid(fmaps.astype(jnp.float32), 4)

        intr_t = jnp.broadcast_to(intr8, (N, 4))
        flow_gt, valid_gt = pops.projective_transform(
            poses_gt[None], disps_gt[None], intr_t[None], ii, jj)
        flow_gt, valid_gt = flow_gt[0], valid_gt[0][..., 0]

        poses = jnp.broadcast_to(poses_gt[0], (N, 7))   # gauge: all at GT0
        disps = jnp.ones((N, h, w))
        net = cn[ii]
        inp = ci[ii]
        target = jnp.broadcast_to(coords0, (len(ii_np), h, w, 2))
        zeros_sens = jnp.zeros_like(disps)

        def round_body(carry):
            poses, disps, net, target = carry
            coords1, _ = pops.projective_transform(
                poses[None], disps[None], intr_t[None], ii, jj)
            coords1 = coords1[0]
            corr = corr_ops.alt_corr(pyr, ii, jj, coords1)
            motn = jnp.clip(jnp.concatenate(
                [coords1 - coords0[None], target - coords1], -1), -64, 64)
            net, delta, weight = model.apply(
                {"params": params}, net, inp, corr, motn,
                method=DroidNet.update_step)
            target = coords1 + delta.astype(jnp.float32)
            eta_agg, _ = model.apply({"params": params}, net, ix, Mk,
                                     method=DroidNet.update_agg)
            # per-depth-frame damping rows follow plan.kx (= arange(N) for
            # a neighborhood graph; padded rows repeat kx[-1], giving them
            # a real positive damping exactly like the production path)
            eta = 0.2 * eta_agg[plan.kx] + 1e-7
            poses, disps = dba(poses, disps, intr8, target,
                               weight.astype(jnp.float32), eta, zeros_sens,
                               plan, iters=2)
            return poses, disps, net, target

        total = 0.0
        carry = (poses, disps, net, target)
        for k in range(iters):
            # rematerialize each round: the unrolled graph of `iters`
            # GRU+Schur rounds would otherwise hold every intermediate
            carry = jax.checkpoint(round_body)(carry)
            poses, disps, net, target = carry
            # geodesic pose error on the optimized frames
            derr = lie.log(lie.mul(poses[1:], lie.inv(poses_gt[1:])))
            pose_err = jnp.abs(derr).mean()
            disp_err = jnp.abs(disps - disps_gt).mean()
            flow_err = (jnp.abs(target - flow_gt)
                        * valid_gt[..., None]).mean()
            g = gamma ** (iters - k - 1)
            total = total + g * (w_pose * pose_err + w_disp * disp_err
                                 + w_flow * flow_err)
        ate = jnp.linalg.norm(
            lie.to_matrix(lie.inv(poses))[:, :3, 3]
            - lie.to_matrix(lie.inv(poses_gt))[:, :3, 3], axis=-1).mean()
        return total, ate

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, imgs, disps_gt, poses_gt, intr8):
        def loss_fn(params):
            losses, ates = jax.vmap(
                scene_loss, in_axes=(None, 0, 0, 0, 0))(
                    params, imgs, disps_gt, poses_gt, intr8)
            return losses.mean(), ates.mean()

        (loss, ate), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(loss=loss, ate=ate, gnorm=gnorm)

    return train_step


def train_dba(steps=1500, batch=2, N=7, H=96, W=128, iters=8, lr=5e-5,
              seed=1, init_ckpt="pretrained/droid_selftrained.msgpack",
              ckpt_path="pretrained/droid_dba.msgpack",
              log_every=20, params=None, buckets=None, pool=0):
    """Fine-tune the update operator through the BA layer.

    Starts from the flow-pretrained checkpoint (stage 1) when present —
    cold-starting BA-unrolled training with random heads makes the
    solver chase noise."""
    import os
    from flax import serialization
    from ..models.weights import init_params

    rng = np.random.RandomState(seed)
    if params is None:
        if init_ckpt and os.path.exists(init_ckpt):
            params = load_selftrained(init_ckpt)
            print(f"init from {init_ckpt}")
        else:
            params = init_params(jax.random.PRNGKey(seed), H=H, W=W)
    # global-norm clip, not the reference's per-element 0.01 zeroing —
    # see the rationale at train()'s optimizer above
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps,
                                                             0.05)))
    opt_state = tx.init(params)
    step_fn = make_dba_train_step(tx, N=N, iters=iters)
    history = []

    def save(p):
        if not ckpt_path:
            return
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
        with open(ckpt_path, "wb") as f:
            f.write(serialization.to_bytes(p))
        print(f"saved {ckpt_path}", flush=True)

    if buckets is None:
        buckets = [(H, W, 80.0)]
    mk = lambda r, b, Hb, Wb, fxb: make_seq_batch(r, b, N, Hb, Wb, fx=fxb)
    if pool:
        pre = _Pool(mk, buckets, seed, batch, pool)
    else:
        pre = _Prefetcher(mk, buckets, seed, batch)
    try:
        for step in range(steps):
            imgs, disps_gt, poses_gt, intr8 = pre.get()
            params, opt_state, m = step_fn(params, opt_state, imgs,
                                           disps_gt, poses_gt, intr8)
            if step % log_every == 0 or step == steps - 1:
                print(f"step {step}: loss {float(m['loss']):.4f} "
                      f"ate {float(m['ate']):.4f} "
                      f"({imgs.shape[2]}x{imgs.shape[3]}) "
                      f"gnorm {float(m['gnorm']):.2f}", flush=True)
                history.append(float(m["ate"]))
            if step and step % 200 == 0:
                # periodic checkpoint: a killed long run keeps its
                # progress. donate_argnums consumed the old params
                # buffer, so serialize the live one before the next
                # step overwrites it
                save(jax.device_get(params))
    finally:
        pre.close()
    save(params)
    return params, history
