"""End-to-end frontend: images -> correspondences (the SP gradient path).

Port of `get_matches_from_SP` (train_good_utils.py:649-756): run SuperPoint
on both grayscale frames, post-process to keypoints + differentiable
subpixel offsets + sparse descriptors, mutual-NN match, and emit the
[B, N, 4] correspondence tensor `xs + offsets` whose offset component keeps
the solver loss differentiable w.r.t. the SuperPoint weights
(Train_model_pipeline.py:375-384). Fully on-device, jit-able, static shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .matching import Matches, gather_matches, mutual_nn_match
from .process import Keypoints, extract_keypoints
from .superpoint import SuperPointNet, flatten_detection


class FrontendParams:
    """The reference SP_params knob set (configs/*:SP_params).

    conv_backend routes the CNN forward: 'auto' = fused Pallas convs on
    TPU (frontend/sp_pallas.py — value-equal to the flax modules,
    measured ~3x cheaper under grad at full res), flax elsewhere;
    'fused' / 'flax' force a side."""

    def __init__(
        self,
        out_num_points: int = 1000,
        patch_size: int = 5,
        nms_dist: int = 4,
        conf_thresh: float = 0.015,
        nn_thresh: float = 1.0,
        conv_backend: str = "auto",
        remat: str = "none",
    ):
        self.out_num_points = out_num_points
        self.patch_size = patch_size
        self.nms_dist = nms_dist
        self.conf_thresh = conf_thresh
        self.nn_thresh = nn_thresh
        self.conv_backend = conv_backend
        # 'block' reruns each encoder double-conv in the backward
        # (jax.checkpoint) instead of saving full-res activations.
        self.remat = remat


def frontend_params_from_config(cfg) -> FrontendParams:
    """training.SP_params (train_good.py:199-206) -> FrontendParams.

    Unknown keys in the config dict are rejected loudly (the config
    audit's no-silent-no-op contract)."""
    sp = dict(getattr(cfg.training, "sp_params", None) or {})
    known = {"out_num_points", "patch_size", "nms_dist", "conf_thresh",
             "nn_thresh", "conv_backend", "remat"}
    unknown = set(sp) - known
    if unknown:
        raise ValueError(f"unknown SP_params keys: {sorted(unknown)}")
    return FrontendParams(**sp)


def _use_fused_convs(fp: FrontendParams) -> bool:
    mode = getattr(fp, "conv_backend", "auto")
    if mode == "fused":
        return True
    if mode == "auto":
        import jax

        return jax.default_backend() in ("tpu", "axon")
    return False


def run_superpoint(
    net: SuperPointNet,
    params,
    images: jnp.ndarray,
    fp: FrontendParams,
    bn_train: bool = False,
    bn_groups: int = 1,
):
    """images: [B, H, W] grayscale in [0,1] -> Keypoints with descriptors.

    `bn_train=True` (BatchNorm nets only) runs BN on BATCH statistics
    with momentum buffer updates — the reference's train-mode semantics
    for end-to-end SP fine-tuning (Train_model_pipeline.py:367-377) —
    and returns `(Keypoints, new_batch_stats)` instead of bare
    Keypoints. This path always takes the flax forward: the fused-conv
    backend folds BN from RUNNING stats, which is an inference-only
    transform."""
    remat = getattr(fp, "remat", "none")
    if bn_train:
        def fwd(p, im):
            return net.apply(
                p, im, train=True, bn_groups=bn_groups,
                mutable=["batch_stats"],
            )

        if remat in ("block", "full"):
            fwd = jax.checkpoint(fwd)
        outs, new_vars = fwd(params, images[..., None])
        new_stats = new_vars["batch_stats"]
    elif _use_fused_convs(fp):
        from .sp_pallas import superpoint_forward_fused

        outs = superpoint_forward_fused(
            net, params, images[..., None], remat=remat,
        )
        new_stats = None
    elif remat in ("block", "full"):
        # The flax forward has no per-block checkpoint boundary; 'block'
        # degrades to 'full' here rather than silently ignoring the
        # request (ADVICE r4).
        outs = jax.checkpoint(
            lambda p, im: net.apply(p, im)
        )(params, images[..., None])
        new_stats = None
    else:
        outs = net.apply(params, images[..., None])
        new_stats = None
    heatmap = flatten_detection(outs["semi"])
    kpts = extract_keypoints(
        heatmap,
        outs["desc"],
        out_num_points=fp.out_num_points,
        nms_dist=fp.nms_dist,
        conf_thresh=fp.conf_thresh,
        patch_size=fp.patch_size,
    )
    if bn_train:
        return kpts, new_stats
    return kpts


def get_matches_from_sp(
    net: SuperPointNet,
    params,
    imgs_grey: Tuple[jnp.ndarray, jnp.ndarray],
    fp: FrontendParams,
    bn_train: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Two frames -> correspondence dict for the solver data_batch.

    Returns {'matches_xy_ori' [B,N,4], 'quality' [B,N,1], 'valid' [B,N],
    'kpts1', 'kpts2', 'matches'} (+ 'new_batch_stats' when
    `bn_train=True` — the momentum-updated BN buffers the joint train
    step must write back, reference train-mode BN semantics).
    """
    # One [2B] net pass for both frames, split after: value-identical
    # (the CNN is per-item; eval BN runs on running stats, train BN uses
    # bn_groups=2 for exact per-frame statistics parity with the
    # reference's two per-frame forwards), and measured 3x cheaper under
    # grad on the v5e — XLA picks a pathological conv layout strategy
    # for B=4 full-res chains that it avoids at B=8 (93.8 ms fwd+bwd for
    # two B=4 encoder chains vs 31.6 ms for one B=8 chain, tools-level
    # experiment, ROADMAP round-3 §joint perf).
    B = imgs_grey[0].shape[0]
    both = jnp.concatenate([imgs_grey[0], imgs_grey[1]], axis=0)
    new_stats = None
    if bn_train:
        kk, new_stats = run_superpoint(
            net, params, both, fp, bn_train=True, bn_groups=2
        )
    else:
        kk = run_superpoint(net, params, both, fp)
    k1 = jax.tree_util.tree_map(lambda a: a[:B], kk)
    k2 = jax.tree_util.tree_map(lambda a: a[B:], kk)
    m = mutual_nn_match(
        k1.desc, k2.desc, k1.valid, k2.valid,
        nn_thresh=fp.nn_thresh, num_matches=fp.out_num_points,
    )
    xy1 = k1.xy + k1.offsets
    xy2 = k2.xy + k2.offsets
    matches_xy = gather_matches(xy1, xy2, m)
    # Match quality: 1 - d/nn_thresh in (0, 1], zero for padded entries
    # (stands in for the SIFT ratio-derived quality column).
    quality = jnp.where(
        m.valid, 1.0 - m.scores / fp.nn_thresh, 0.0
    )[..., None]
    # Pad empty slots by cyclically resampling the REAL matches, as the
    # reference's crop_or_pad_choice does (utils_misc.py:139-161). Zero
    # padding instead puts ~(1 - n_valid/N) of the solver's initial softmax
    # mass on degenerate (0,0)-(0,0) rows, which pins the F-loss at the
    # clamp and stalls joint training (measured: stage-1 loss flat at
    # 0.0197~clamp_at with 20 valid of 200 slots). Matches are sorted
    # valid-first, so index i >= n_valid maps to i mod n_valid.
    n = matches_xy.shape[-2]
    ar = jnp.arange(n)[None, :]
    n_valid = jnp.sum(m.valid.astype(jnp.int32), axis=-1, keepdims=True)
    pad_idx = ar % jnp.maximum(n_valid, 1)
    idx = jnp.where(m.valid, ar, pad_idx)
    matches_xy = jnp.take_along_axis(matches_xy, idx[..., None], axis=-2)
    quality = jnp.take_along_axis(quality, idx[..., None], axis=-2)
    out = {
        "matches_xy_ori": matches_xy,
        "quality": quality,
        "valid": m.valid,
        "kpts1": k1,
        "kpts2": k2,
        "matches": m,
    }
    if bn_train:
        out["new_batch_stats"] = new_stats
    return out


class ValModelHeatmap:
    """Inference wrapper parity with the reference `Val_model_heatmap`
    (Val_model_heatmap.py:26-201): config-driven SuperPoint forward +
    heatmap→NMS points→subpixel soft-argmax→sparse descriptors."""

    def __init__(self, params, config: Dict | None = None, net=None):
        c = config or {}
        self.net = net or SuperPointNet()
        self.params = params
        self.fp = FrontendParams(
            out_num_points=c.get("top_k", c.get("out_num_points", 1000)),
            patch_size=c.get("patch_size", 5),
            nms_dist=c.get("nms_dist", 4),
            conf_thresh=c.get("conf_thresh", 0.015),
            nn_thresh=c.get("nn_thresh", 1.0),
        )
        self._last = None

    def run(self, images: jnp.ndarray) -> Keypoints:
        """images: [B, H, W] grayscale in [0, 1] -> Keypoints (+desc)."""
        self._last = run_superpoint(self.net, self.params, images, self.fp)
        return self._last

    def heatmap_to_pts(self):
        """[B, K, 3] (x, y, score) of the last run (ref :108)."""
        k = self._last
        import jax.numpy as jnp  # local alias for clarity

        return jnp.concatenate(
            [k.xy + k.offsets, k.scores[..., None]], axis=-1
        )

    def desc_to_sparse_desc(self):
        """[B, K, D] sparse descriptors of the last run (ref :145)."""
        return self._last.desc
