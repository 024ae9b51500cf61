"""Trainer + DPT structural tests (small, CPU-friendly shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_trainer_reduces_epe():
    from splatslam_tpu.train.droid_trainer import train
    params, history = train(steps=8, batch=2, H=64, W=96, lr=4e-4,
                            ckpt_path=None, log_every=4)
    assert np.isfinite(history).all()
    assert history[-1] < history[0], history


def test_trainer_checkpoint_roundtrip(tmp_path):
    from splatslam_tpu.train.droid_trainer import train, load_selftrained
    ckpt = str(tmp_path / "droid.msgpack")
    params, _ = train(steps=2, batch=1, H=64, W=96, ckpt_path=ckpt,
                      log_every=10)
    loaded = load_selftrained(ckpt)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_dpt_structure():
    from splatslam_tpu.models.dpt import DPTDepthModel
    m = DPTDepthModel()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    out = m.apply({"params": params}, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64)
    assert float(out.min()) >= 0.0  # non-negative head
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 100e6 < n_params < 140e6  # DPT-hybrid ballpark (~120M)
