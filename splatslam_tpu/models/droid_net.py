"""DROID tracking network in Flax — fnet / cnet encoders + ConvGRU update.

TPU-native (NHWC, bf16-capable) re-implementation of the reference's
thirdparty/glorie_slam/modules/droid_net/{extractor.py, gru.py,
droid_net.py}. Structure and channel counts match the released
`droid.pth` checkpoint exactly (see models/weights.py for the converter,
including the 2-channel head slicing applied at src/slam.py:79-82), so
pretrained weights transfer. The reference's GradientClip backward hooks
(clipping.py:19-40) are inference-time no-ops and are not needed: the
tracker never backprops through the network.

Shapes: all modules take channel-last (B, H, W, C); the reference's
(B·N, C, H, W) batching becomes a plain leading batch axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class InstanceNorm(nn.Module):
    """InstanceNorm2d, affine=False (torch default used by BasicEncoder)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def _norm(norm_fn: str):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    """3x3-3x3 residual block (reference extractor.py:18-69)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_norm(self.norm_fn)(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_norm(self.norm_fn)(y))
        if self.stride > 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding=0,
                        dtype=self.dtype, name="downsample")(x)
            x = _norm(self.norm_fn)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """3-stage stride-8 residual CNN (reference extractor.py:75-140)."""
    out_dim: int
    norm_fn: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        DIM = 32
        x = nn.Conv(DIM, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(_norm(self.norm_fn)(x))
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype, name="layer1_0")(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, self.dtype, name="layer1_1")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 2, self.dtype, name="layer2_0")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1, self.dtype, name="layer2_1")(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 2, self.dtype, name="layer3_0")(x)
        x = ResidualBlock(4 * DIM, self.norm_fn, 1, self.dtype, name="layer3_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class ConvGRU(nn.Module):
    """3x3 ConvGRU with global-context gates (reference gru.py:19-47)."""
    h_planes: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp):
        hp = self.h_planes
        net_inp = jnp.concatenate([net, inp], axis=-1)

        glo = nn.sigmoid(nn.Conv(hp, (1, 1), dtype=self.dtype, name="w")(net)) * net
        glo = glo.mean(axis=(1, 2), keepdims=True)     # (B,1,1,C)

        z = nn.sigmoid(
            nn.Conv(hp, (3, 3), padding=1, dtype=self.dtype, name="convz")(net_inp)
            + nn.Conv(hp, (1, 1), dtype=self.dtype, name="convz_glo")(glo))
        r = nn.sigmoid(
            nn.Conv(hp, (3, 3), padding=1, dtype=self.dtype, name="convr")(net_inp)
            + nn.Conv(hp, (1, 1), dtype=self.dtype, name="convr_glo")(glo))
        q = nn.tanh(
            nn.Conv(hp, (3, 3), padding=1, dtype=self.dtype, name="convq")(
                jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(hp, (1, 1), dtype=self.dtype, name="convq_glo")(glo))
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Per-keyframe aggregation → damping eta + upsample mask
    (reference droid_net.py:48-80)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, ix, num_kf: int):
        """net (N,H,W,128); ix (N,) edge→keyframe slot; num_kf static."""
        net = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                              name="conv1")(net))
        # scatter_mean over edges sharing a source keyframe, as a one-hot
        # MXU contraction: jax.ops.segment_sum lowers to an XLA scatter
        # that costs ~260 ms at (N,30,40,128) on TPU (the multi-million-
        # index scatter cliff, docs/TPU_PERF_NOTES.md) — the (M,N) one-hot
        # matmul form is ~100x cheaper and exact (counts in fp32: bf16
        # cannot represent integers above 256 exactly)
        onehot = (ix[None, :] == jnp.arange(num_kf)[:, None]).astype(
            jnp.float32)                                   # (M, N)
        s = jnp.einsum("mn,nhwc->mhwc", onehot,
                       net.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        cnt = onehot.sum(-1)                               # (M,)
        net = (s / jnp.clip(cnt, 1.0, None)[:, None, None, None]).astype(
            net.dtype)
        net = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                              name="conv2")(net))
        eta = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="eta_0")(net)
        eta = 0.01 * nn.softplus(eta)[..., 0]          # (M,H,W)
        upmask = nn.Conv(8 * 8 * 9, (1, 1), dtype=self.dtype,
                         name="upmask_0")(net)         # (M,H,W,576)
        return eta, upmask


class UpdateModule(nn.Module):
    """Correlation+flow encoders, ConvGRU, delta/weight heads
    (reference droid_net.py:83-153)."""
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        self.corr_enc_0 = nn.Conv(128, (1, 1), dtype=d, name="corr_enc_0")
        self.corr_enc_2 = nn.Conv(128, (3, 3), padding=1, dtype=d, name="corr_enc_2")
        self.flow_enc_0 = nn.Conv(128, (7, 7), padding=3, dtype=d, name="flow_enc_0")
        self.flow_enc_2 = nn.Conv(64, (3, 3), padding=1, dtype=d, name="flow_enc_2")
        self.weight_0 = nn.Conv(128, (3, 3), padding=1, dtype=d, name="weight_0")
        self.weight_2 = nn.Conv(2, (3, 3), padding=1, dtype=d, name="weight_2")
        self.delta_0 = nn.Conv(128, (3, 3), padding=1, dtype=d, name="delta_0")
        self.delta_2 = nn.Conv(2, (3, 3), padding=1, dtype=d, name="delta_2")
        self.gru = ConvGRU(128, dtype=d)
        self.agg = GraphAgg(dtype=d)

    def __call__(self, net, inp, corr, flow=None, ix=None, num_kf: int = 0):
        """net/inp (N,H,W,128); corr (N,H,W,196); flow (N,H,W,4).

        Returns (net, delta, weight) and, when ix is given,
        (net, delta, weight, eta, upmask) like the reference forward.
        """
        N, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((N, H, W, 4), net.dtype)

        corr = nn.relu(self.corr_enc_0(corr))
        corr = nn.relu(self.corr_enc_2(corr))
        flow = nn.relu(self.flow_enc_0(flow))
        flow = nn.relu(self.flow_enc_2(flow))

        net = self.gru(net, jnp.concatenate([inp, corr, flow], axis=-1))

        delta = self.delta_2(nn.relu(self.delta_0(net)))
        weight = nn.sigmoid(self.weight_2(nn.relu(self.weight_0(net))))

        if ix is not None:
            eta, upmask = self.agg(net, ix, num_kf)
            return net, delta, weight, eta, upmask
        return net, delta, weight


class DroidNet(nn.Module):
    """fnet (instance-norm, 128ch) + cnet (no-norm, 256ch) + update
    (reference droid_net.py:156-162)."""
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(128, "instance", dtype=self.dtype)
        self.cnet = BasicEncoder(256, "none", dtype=self.dtype)
        self.update = UpdateModule(dtype=self.dtype)

    def features(self, images):
        """images (B,H,W,3) normalized → fmap (B,H/8,W/8,128)."""
        return self.fnet(images)

    def context(self, images):
        """images (B,H,W,3) → (net tanh, inp relu), each (B,H/8,W/8,128)."""
        x = self.cnet(images)
        net, inp = jnp.split(x, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def update_step(self, net, inp, corr, flow=None):
        """Per-edge half of the update operator (chunk-friendly)."""
        return self.update(net, inp, corr, flow)

    def update_agg(self, net, ix, num_kf: int):
        """GraphAgg half: per-keyframe damping eta + upsample mask."""
        return self.update.agg(net, ix, num_kf)

    def __call__(self, images, net, inp, corr, flow=None, ix=None,
                 num_kf: int = 0):
        """Init-friendly umbrella: touches all three submodules."""
        fmap = self.features(images)
        cn, ci = self.context(images)
        out = self.update(net, inp, corr, flow, ix, num_kf)
        return fmap, cn, ci, out


def compute_dtype():
    """Network compute dtype on the hot path: bf16 (half the HBM traffic,
    native MXU rate — the reference's AMP fp16 analog, SURVEY §2.7) with
    fp32 parameters; set SPLATSLAM_F32_NET=1 to force fp32 (parity
    debugging). BA/solvers always run fp32."""
    import os
    return jnp.float32 if os.environ.get("SPLATSLAM_F32_NET") \
        else jnp.bfloat16


# HOST constants (np, not jnp): a module-level device array gets captured
# as a jaxpr constant by every function tracing normalize_images, and the
# lowering then has to FETCH it to embed it in the HLO — over the tunneled
# TPU link that one fetch measured 250+ s (it drains the whole async queue)
# and, worse, makes the compiled-program cache key content-dependent.
IMAGE_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] (…,H,W,3) → ImageNet-normalized (motion_filter.py:42-43)."""
    return (images - IMAGE_MEAN) / IMAGE_STD
