"""Pretrained-weight loading: torch `droid.pth` → Flax params.

Mirrors the reference checkpoint surgery (src/slam.py:74-85): strips the
`module.` DataParallel prefix and slices the update delta/weight head
output channels to 2. Torch Conv2d kernels (O, I, kh, kw) are transposed
to Flax's (kh, kw, I, O).

If no checkpoint is available (this environment ships none), `init_params`
gives a reproducible random initialization with the same tree structure.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from .droid_net import DroidNet


def init_params(key=None, H: int = 48, W: int = 64) -> Dict[str, Any]:
    """Random-initialized DroidNet params (tree-compatible with converter).

    The whole init runs under one jit: eagerly it is ~80 tiny XLA
    programs, each costing a compiler/loader RPC under the axon tunnel.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    net = DroidNet()
    h, w = H // 8, W // 8

    @jax.jit
    def _init(key):
        return net.init(
            key, jnp.zeros((1, H, W, 3)),
            jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
            jnp.zeros((1, h, w, 196)), jnp.zeros((1, h, w, 4)),
            jnp.zeros((1,), jnp.int32), 1)["params"]

    return _init(key)


def _enc_mapping(prefix: str):
    """torch name → flax path for a BasicEncoder."""
    m = {f"{prefix}.conv1": (prefix, "conv1"),
         f"{prefix}.conv2": (prefix, "conv2")}
    for L, blocks in (("layer1", 2), ("layer2", 2), ("layer3", 2)):
        for i in range(blocks):
            for c in ("conv1", "conv2"):
                m[f"{prefix}.{L}.{i}.{c}"] = (prefix, f"{L}_{i}", c)
            m[f"{prefix}.{L}.{i}.downsample.0"] = (prefix, f"{L}_{i}", "downsample")
    return m


_UPDATE_MAPPING = {
    "update.corr_encoder.0": ("update", "corr_enc_0"),
    "update.corr_encoder.2": ("update", "corr_enc_2"),
    "update.flow_encoder.0": ("update", "flow_enc_0"),
    "update.flow_encoder.2": ("update", "flow_enc_2"),
    "update.weight.0": ("update", "weight_0"),
    "update.weight.2": ("update", "weight_2"),
    "update.delta.0": ("update", "delta_0"),
    "update.delta.2": ("update", "delta_2"),
    "update.gru.convz": ("update", "gru", "convz"),
    "update.gru.convr": ("update", "gru", "convr"),
    "update.gru.convq": ("update", "gru", "convq"),
    "update.gru.w": ("update", "gru", "w"),
    "update.gru.convz_glo": ("update", "gru", "convz_glo"),
    "update.gru.convr_glo": ("update", "gru", "convr_glo"),
    "update.gru.convq_glo": ("update", "gru", "convq_glo"),
    "update.agg.conv1": ("update", "agg", "conv1"),
    "update.agg.conv2": ("update", "agg", "conv2"),
    "update.agg.eta.0": ("update", "agg", "eta_0"),
    "update.agg.upmask.0": ("update", "agg", "upmask_0"),
}


def torch_state_to_params(state_dict) -> Dict[str, Any]:
    """Convert a torch DroidNet state dict (numpy-able values) to params."""
    mapping = {**_enc_mapping("fnet"), **_enc_mapping("cnet"),
               **_UPDATE_MAPPING}
    # strip DataParallel prefix (slam.py:77)
    state = {k.replace("module.", ""): np.asarray(v)
             for k, v in state_dict.items()}
    # slice delta/weight heads to 2 output channels (slam.py:79-82)
    for head in ("update.weight.2", "update.delta.2"):
        if f"{head}.weight" in state:
            state[f"{head}.weight"] = state[f"{head}.weight"][:2]
            state[f"{head}.bias"] = state[f"{head}.bias"][:2]

    params: Dict[str, Any] = {}
    for tname, path in mapping.items():
        wkey = f"{tname}.weight"
        if wkey not in state:
            continue
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(path[-1], {})
        leaf["kernel"] = jnp.asarray(
            state[wkey].transpose(2, 3, 1, 0))          # OIHW → HWIO
        bkey = f"{tname}.bias"
        if bkey in state:
            leaf["bias"] = jnp.asarray(state[bkey])
    return params


def load_droid_params(path: str):
    """Load tracker weights: torch droid.pth, a self-trained flax
    .msgpack (train_droid.py), or random init when neither exists."""
    if path and os.path.exists(path):
        if path.endswith(".msgpack"):
            from flax import serialization
            template = init_params()
            with open(path, "rb") as f:
                return serialization.from_bytes(template, f.read())
        import torch
        sd = torch.load(path, map_location="cpu")
        return torch_state_to_params(sd)
    if path:
        # fail LOUD on a configured-but-missing path: silently falling
        # back to other weights turns a config typo into garbage
        # tracking with nothing in the log
        print(f"[weights] WARNING: tracking.pretrained={path!r} does "
              "not exist — falling back to in-repo checkpoints",
              flush=True)
    # fall back to a self-trained checkpoint: prefer the stage-2 net
    # (trained THROUGH the differentiable BA layer, train_dba) over the
    # flow-only stage-1 net
    for alt in ("pretrained/droid_dba.msgpack",
                "pretrained/droid_selftrained.msgpack"):
        if os.path.exists(alt):
            from flax import serialization
            template = init_params()
            with open(alt, "rb") as f:
                print(f"[weights] loading {alt}", flush=True)
                return serialization.from_bytes(template, f.read())
    print("[weights] WARNING: no checkpoint found — RANDOM tracker "
          "weights (oracle mode unaffected)", flush=True)
    return init_params()
