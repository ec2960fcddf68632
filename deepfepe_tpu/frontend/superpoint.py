"""SuperPoint detector/descriptor CNN (flax, NHWC, TPU-native).

Re-implementation of the external frontend the reference pip-installs
(`pytorch-superpoint` branch module_20200707 — SURVEY.md §2.2):
`SuperPointNet_gauss2`: a VGG-style shared encoder, a detector head
producing `semi` (64 cells + dustbin per 8x8 block) and a descriptor head
producing dense 256-d descriptors at 1/8 resolution. Consumed surface per
train_good.py:198-237 / train_good_utils.py:727-756.

Layout is NHWC (TPU-native conv layout); `semi` is [B, H/8, W/8, 65] and
`desc` is [B, H/8, W/8, 256].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.basic import safe_norm


class SuperPointNet(nn.Module):
    """VGG-style SuperPoint with detector + descriptor heads.

    `dtype` sets the conv compute precision (bfloat16 runs the MXU at
    full rate; params stay float32, outputs return in float32 — same
    policy as models.ErrorEstimator)."""

    det_h: int = 65
    desc_dim: int = 256
    channels: tuple = (64, 64, 64, 64, 128, 128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        """x: [B, H, W, 1] grayscale in [0, 1] -> {'semi', 'desc'}."""
        c = self.channels
        relu = nn.relu
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        conv = lambda ch, k, name: nn.Conv(
            ch, k, padding="SAME", name=name, dtype=self.dtype
        )

        x = x.astype(self.dtype)
        y = relu(conv(c[0], (3, 3), "conv1a")(x))
        y = relu(conv(c[1], (3, 3), "conv1b")(y))
        y = pool(y)
        y = relu(conv(c[2], (3, 3), "conv2a")(y))
        y = relu(conv(c[3], (3, 3), "conv2b")(y))
        y = pool(y)
        y = relu(conv(c[4], (3, 3), "conv3a")(y))
        y = relu(conv(c[5], (3, 3), "conv3b")(y))
        y = pool(y)
        y = relu(conv(c[6], (3, 3), "conv4a")(y))
        y = relu(conv(c[7], (3, 3), "conv4b")(y))

        # Detector head: 65 = 64 cell positions + dustbin.
        d = relu(conv(256, (3, 3), "convPa")(y))
        semi = conv(self.det_h, (1, 1), "convPb")(d).astype(jnp.float32)

        # Descriptor head: dense 256-d at 1/8 resolution (normalization in
        # f32 — unit descriptors feed distance computations).
        e = relu(conv(256, (3, 3), "convDa")(y))
        desc = conv(self.desc_dim, (1, 1), "convDb")(e).astype(jnp.float32)
        desc = desc / (safe_norm(desc, axis=-1, keepdims=True) + 1e-10)

        return {"semi": semi, "desc": desc}


class _DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x2 — pytorch-superpoint unet_parts
    double_conv, the gauss2 backbone block.

    `dtype` sets the conv+BN compute precision (bf16 = MXU full rate,
    half the HBM traffic); params and running stats stay float32."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda name: nn.Conv(
            self.out_ch, (3, 3), padding="SAME", name=name, dtype=self.dtype
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, name=name, dtype=self.dtype
        )
        x = nn.relu(bn("bn0")(conv("conv0")(x)))
        x = nn.relu(bn("bn1")(conv("conv1")(x)))
        return x


class SuperPointNetGauss2(nn.Module):
    """`SuperPointNet_gauss2` — the BN variant the reference instantiates
    (train_good.py:224-225; pytorch-superpoint
    models/SuperPointNet_gauss2.py): unet-style double-conv encoder
    (64-64-128-128) with BatchNorm everywhere, BN'd detector/descriptor
    heads (c5=256, det 65, desc 256). The reference's pretrained_SP model
    zoo is in this layout; import via
    utils.torch_import.convert_superpoint_gauss2_state.

    Inference uses the checkpoint's running BN statistics
    (train=False); pass train=True + mutable=['batch_stats'] to train.
    `dtype=bfloat16` runs conv/BN compute at MXU full rate (params and
    running stats stay float32; heads return float32).
    """

    det_h: int = 65
    desc_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, name=name, dtype=self.dtype
        )
        conv = lambda ch, k, name: nn.Conv(
            ch, k, padding="SAME", name=name, dtype=self.dtype
        )
        x = x.astype(self.dtype)
        y = _DoubleConv(64, name="inc", dtype=self.dtype)(x, train)
        y = _DoubleConv(64, name="down1", dtype=self.dtype)(pool(y), train)
        y = _DoubleConv(128, name="down2", dtype=self.dtype)(pool(y), train)
        y = _DoubleConv(128, name="down3", dtype=self.dtype)(pool(y), train)

        d = nn.relu(bn("bnPa")(conv(256, (3, 3), "convPa")(y)))
        semi = bn("bnPb")(conv(self.det_h, (1, 1), "convPb")(d)).astype(
            jnp.float32
        )

        e = nn.relu(bn("bnDa")(conv(256, (3, 3), "convDa")(y)))
        desc = bn("bnDb")(conv(self.desc_dim, (1, 1), "convDb")(e)).astype(
            jnp.float32
        )
        desc = desc / (safe_norm(desc, axis=-1, keepdims=True) + 1e-10)

        return {"semi": semi, "desc": desc}


def flatten_detection(semi: jnp.ndarray) -> jnp.ndarray:
    """semi [B, H/8, W/8, 65] -> dense heatmap [B, H, W].

    Softmax over the 65 channels, drop the dustbin, depth-to-space the 64
    cell scores into 8x8 pixel blocks (ref: superpoint flattenDetection via
    train_good_utils.py:743).
    """
    prob = nn.softmax(semi, axis=-1)[..., :64]  # [B, Hc, Wc, 64]
    B, Hc, Wc, _ = prob.shape
    prob = prob.reshape(B, Hc, Wc, 8, 8)
    prob = prob.transpose(0, 1, 3, 2, 4)  # B, Hc, 8, Wc, 8
    return prob.reshape(B, Hc * 8, Wc * 8)
