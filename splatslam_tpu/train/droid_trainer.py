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
        cfg = {
            "dataset": "synthetic",
            "cam": {"H": H, "W": W, "fx": fx_s, "fy": fx_s,
                    "cx": W / 2 - 0.5,
                    "cy": H / 2 - 0.5, "H_out": H, "W_out": W,
                    "H_edge": 0, "W_edge": 0},
            "synthetic": {"n_frames": 2, "seed": int(rng.randint(1 << 30)),
                          "motion_scale": float(0.5 + 9.5 * rng.rand())},
        }
        ds = Synthetic(cfg)
        _, im1, d1, p1 = ds[0]
        _, im2, _, p2 = ds[1]
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


def train(steps=2000, batch=4, H=96, W=128, lr=2e-4, seed=0,
          ckpt_path="pretrained/droid_selftrained.msgpack", log_every=25,
          params=None):
    """Train and save params (flax serialization msgpack)."""
    from flax import serialization
    from ..models.weights import init_params

    rng = np.random.RandomState(seed)
    if params is None:
        params = init_params(jax.random.PRNGKey(seed), H=H, W=W)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps,
                                                             0.05)))
    opt_state = tx.init(params)
    step_fn = make_train_step(tx)
    history = []
    for step in range(steps):
        img1, img2, flow, valid = make_pair_batch(rng, batch, H, W)
        params, opt_state, m = step_fn(params, opt_state, img1, img2,
                                       flow, valid)
        if step % log_every == 0 or step == steps - 1:
            print(f"step {step}: loss {float(m['loss']):.4f} "
                  f"epe {float(m['epe']):.3f} px "
                  f"gnorm {float(m['gnorm']):.2f}", flush=True)
            history.append(float(m["epe"]))
    if ckpt_path:
        import os
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
        with open(ckpt_path, "wb") as f:
            f.write(serialization.to_bytes(params))
        print(f"saved {ckpt_path}")
    return params, history


def load_selftrained(path: str):
    from flax import serialization
    from ..models.weights import init_params
    template = init_params()
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
