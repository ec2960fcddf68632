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
import jax
import jax.numpy as jnp
import numpy as np

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


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact `torch.nn.BatchNorm2d` semantics (the layer
    the reference's SuperPointNet_gauss2 is built from).

    torch-parity details that differ from `flax.linen.BatchNorm`:

    - momentum convention: torch momentum (default 0.1) is the weight of
      the NEW batch statistic — `r <- (1 - m) * r + m * stat` (flax's
      default 0.99 is the weight of the OLD average, i.e. torch 0.01);
    - the running variance update uses the UNBIASED batch variance
      (n/(n-1) correction) while normalization uses the biased one;
    - `groups` splits the leading batch axis into that many virtual
      batches: per-group statistics normalize each group and the buffers
      take `groups` sequential momentum updates.  The reference's joint
      step runs the SP net once PER FRAME (train_good_utils.py:668-677),
      so its train-mode BN sees per-frame batch stats and two buffer
      updates per step; our TPU-native pipeline concatenates both frames
      into ONE [2B] net call (the round-3 3x conv-layout win) and
      recovers the exact reference semantics with `groups=2`.

    Variable layout matches `flax.linen.BatchNorm` (params: scale/bias,
    batch_stats: mean/var) so existing checkpoints, the .pth.tar
    importer (utils/torch_import.py), and the fused-affine folding
    (frontend/sp_pallas.py) are unchanged.  Batch statistics are always
    computed in float32; normalization runs in `dtype` exactly as flax
    does, so eval-mode outputs are unchanged vs the previous
    nn.BatchNorm modules.
    """

    momentum: float = 0.1  # torch convention: weight of the new stat
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool = True,
        groups: int = 1,
    ) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        dt = self.dtype
        if use_running_average:
            mul = jax.lax.rsqrt(ra_var.value.astype(dt) + jnp.asarray(
                self.eps, dt)) * scale.astype(dt)
            return (x.astype(dt) - ra_mean.value.astype(dt)) * mul \
                + bias.astype(dt)

        g = groups
        B = x.shape[0]
        assert B % g == 0, (B, g)
        xg = x.reshape(g, B // g, *x.shape[1:])
        axes = tuple(range(1, xg.ndim - 1))
        xf = xg.astype(jnp.float32)
        gmean = jnp.mean(xf, axis=axes)                       # [g, feat]
        gvar = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(gmean)
        n = (B // g) * int(np.prod(x.shape[1:-1]))
        corr = n / max(n - 1, 1)  # unbiased correction for the buffer
        if not self.is_initializing():
            m = self.momentum
            rm, rv = ra_mean.value, ra_var.value
            for k in range(g):  # sequential per-group updates (torch order)
                rm = (1.0 - m) * rm + m * jax.lax.stop_gradient(gmean[k])
                rv = (1.0 - m) * rv + m * jax.lax.stop_gradient(
                    gvar[k] * corr
                )
            ra_mean.value = rm
            ra_var.value = rv
        shape = (g, 1) + (1,) * (xg.ndim - 3) + (feat,)
        mul = jax.lax.rsqrt(gvar.astype(dt) + jnp.asarray(self.eps, dt)) \
            * scale.astype(dt)
        y = (xg.astype(dt) - gmean.astype(dt).reshape(shape)) \
            * mul.reshape(shape) + bias.astype(dt)
        return y.reshape(x.shape)


class _DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x2 — pytorch-superpoint unet_parts
    double_conv, the gauss2 backbone block.

    `dtype` sets the conv+BN compute precision (bf16 = MXU full rate,
    half the HBM traffic); params and running stats stay float32."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, bn_groups: int = 1
    ) -> jnp.ndarray:
        conv = lambda name: nn.Conv(
            self.out_ch, (3, 3), padding="SAME", name=name, dtype=self.dtype
        )
        bn = lambda name: TorchBatchNorm(name=name, dtype=self.dtype)
        kw = dict(use_running_average=not train, groups=bn_groups)
        x = nn.relu(bn("bn0")(conv("conv0")(x), **kw))
        x = nn.relu(bn("bn1")(conv("conv1")(x), **kw))
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
    (train=False); pass train=True + mutable=['batch_stats'] to train —
    BN then normalizes by BATCH statistics and the running buffers take
    momentum updates, exactly as the reference fine-tunes SuperPoint
    end-to-end (Train_model_pipeline.py:367-377 applies eval() only in
    the frozen no-grad branch).  `bn_groups` splits the batch axis into
    virtual batches for per-frame statistic parity (see TorchBatchNorm).
    `dtype=bfloat16` runs conv/BN compute at MXU full rate (params and
    running stats stay float32; heads return float32).
    """

    det_h: int = 65
    desc_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, bn_groups: int = 1
    ) -> dict:
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        bn = lambda name: TorchBatchNorm(name=name, dtype=self.dtype)
        kw = dict(use_running_average=not train, groups=bn_groups)
        conv = lambda ch, k, name: nn.Conv(
            ch, k, padding="SAME", name=name, dtype=self.dtype
        )
        x = x.astype(self.dtype)
        y = _DoubleConv(64, name="inc", dtype=self.dtype)(x, train, bn_groups)
        y = _DoubleConv(64, name="down1", dtype=self.dtype)(
            pool(y), train, bn_groups)
        y = _DoubleConv(128, name="down2", dtype=self.dtype)(
            pool(y), train, bn_groups)
        y = _DoubleConv(128, name="down3", dtype=self.dtype)(
            pool(y), train, bn_groups)

        d = nn.relu(bn("bnPa")(conv(256, (3, 3), "convPa")(y), **kw))
        semi = bn("bnPb")(
            conv(self.det_h, (1, 1), "convPb")(d), **kw
        ).astype(jnp.float32)

        e = nn.relu(bn("bnDa")(conv(256, (3, 3), "convDa")(y), **kw))
        desc = bn("bnDb")(
            conv(self.desc_dim, (1, 1), "convDb")(e), **kw
        ).astype(jnp.float32)
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
