"""SuperPoint training: synthetic-shapes detector supervision + descriptor
loss from warped pairs.

Rebuild of the external `pytorch-superpoint` training capability the
reference depends on (SURVEY.md §2.2: `Train_model_frontend`): the
MagicPoint recipe — render synthetic geometric shapes with exactly known
corner locations, supervise the 65-way cell classifier — plus the
warped-pair descriptor hinge loss that makes descriptors homography-
covariant. All on-device and jitted; the homographic-adaptation label
refinement for real images composes from these pieces + utils.warp.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .superpoint import SuperPointNet


# ---------------------------------------------------------------------------
# Synthetic-shapes data (host-side numpy): images + exact corner labels.
# ---------------------------------------------------------------------------


class SyntheticShapes:
    """Random polygons / line junctions with known corner keypoints."""

    def __init__(self, image_size: Tuple[int, int] = (120, 160), seed: int = 0):
        self.H, self.W = image_size
        self.rng = np.random.RandomState(seed)

    def _draw_line(self, img, p0, p1, value):
        n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1])) * 2 + 1)
        xs = np.linspace(p0[0], p1[0], n)
        ys = np.linspace(p0[1], p1[1], n)
        for x, y in zip(xs, ys):
            xi, yi = int(round(x)), int(round(y))
            if 0 <= xi < self.W and 0 <= yi < self.H:
                img[max(yi - 1, 0) : yi + 1, max(xi - 1, 0) : xi + 1] = value

    def sample(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (image [H, W] in [0,1], corners [K, 2] xy)."""
        rng = self.rng
        img = np.full((self.H, self.W), rng.uniform(0.0, 0.3))
        corners = []
        for _ in range(rng.randint(2, 6)):
            # Random polygon with 3-6 vertices.
            n_v = rng.randint(3, 7)
            cx, cy = rng.uniform(20, self.W - 20), rng.uniform(15, self.H - 15)
            radius = rng.uniform(8, 30)
            angles = np.sort(rng.uniform(0, 2 * np.pi, n_v))
            pts = np.stack(
                [cx + radius * np.cos(angles), cy + radius * np.sin(angles)], -1
            )
            val = rng.uniform(0.4, 1.0)
            for i in range(n_v):
                self._draw_line(img, pts[i], pts[(i + 1) % n_v], val)
            for p in pts:
                if 4 <= p[0] < self.W - 4 and 4 <= p[1] < self.H - 4:
                    corners.append(p)
        img += rng.randn(self.H, self.W) * 0.03  # sensor noise
        img = np.clip(img, 0, 1)
        return img.astype(np.float32), np.array(corners, np.float32).reshape(-1, 2)

    def batch(self, batch_size: int, max_pts: int = 64) -> Dict[str, np.ndarray]:
        imgs, labels = [], []
        for _ in range(batch_size):
            img, c = self.sample()
            imgs.append(img)
            lab = self.corners_to_cells(c)
            labels.append(lab)
        return {
            "image": np.stack(imgs),
            "cells": np.stack(labels),  # [B, H/8, W/8] int in [0, 64]
        }

    def corners_to_cells(self, corners: np.ndarray) -> np.ndarray:
        """Corner pixels -> 65-way cell labels (64 positions + dustbin=64)."""
        Hc, Wc = self.H // 8, self.W // 8
        lab = np.full((Hc, Wc), 64, np.int32)  # dustbin
        for x, y in corners:
            cx, cy = int(x) // 8, int(y) // 8
            if 0 <= cx < Wc and 0 <= cy < Hc:
                lab[cy, cx] = (int(y) % 8) * 8 + (int(x) % 8)
        return lab

    def pool(self, n: int):
        """Pre-render n (image, corners) samples for reuse across epochs."""
        return [self.sample() for _ in range(n)]


class CornerTextures(SyntheticShapes):
    """Exactly-labeled samples in the joint-training texture style: gaussian
    blobs (background structure, unlabeled) + hard-edged rotated rectangle
    stamps whose 4 corners are the keypoint labels — the texture family of
    `data/synthetic_images._render_texture(n_corners=...)`. Fine-tuning the
    pretrained (polygon-shapes) detector here sharpens localization on the
    joint SP+DeepF data domain."""

    def __init__(self, image_size=(120, 160), n_blobs=40, n_rects=14,
                 seed: int = 0):
        super().__init__(image_size=image_size, seed=seed)
        self.n_blobs = n_blobs
        self.n_rects = n_rects

    def sample(self):
        rng = self.rng
        H, W = self.H, self.W
        img = np.zeros((H, W))
        yy0, xx0 = np.mgrid[0:H, 0:W].astype(np.float64)
        for _ in range(self.n_blobs):
            cx, cy = rng.uniform(0, W), rng.uniform(0, H)
            s = rng.uniform(1.5, 6.0)
            a = rng.uniform(-1.0, 1.0)
            r = int(np.ceil(3.5 * s))
            x0, x1 = max(0, int(cx - r)), min(W, int(cx + r) + 1)
            y0, y1 = max(0, int(cy - r)), min(H, int(cy + r) + 1)
            if x0 >= x1 or y0 >= y1:
                continue
            yy, xx = yy0[y0:y1, x0:x1], xx0[y0:y1, x0:x1]
            img[y0:y1, x0:x1] += a * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
            )
        corners = []
        for _ in range(self.n_rects):
            cx, cy = rng.uniform(6, W - 6), rng.uniform(6, H - 6)
            w2, h2 = rng.uniform(2.0, 7.0), rng.uniform(2.0, 7.0)
            th = rng.uniform(0, np.pi)
            a = rng.uniform(0.4, 1.0) * rng.choice([-1.0, 1.0])
            ct, st = np.cos(th), np.sin(th)
            u = (xx0 - cx) * ct + (yy0 - cy) * st
            v = -(xx0 - cx) * st + (yy0 - cy) * ct
            img += a * ((np.abs(u) < w2) & (np.abs(v) < h2))
            for su, sv in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
                # Rect corner in image coords: c + Rᵀ(θ)·(±w2, ±h2) for the
                # (u, v) frame defined above.
                px = cx + su * w2 * ct - sv * h2 * st
                py = cy + su * w2 * st + sv * h2 * ct
                if 0 <= px < W and 0 <= py < H:
                    corners.append((px, py))
        img -= img.min()
        img /= img.max() + 1e-9
        return img.astype(np.float32), np.asarray(
            corners if corners else np.zeros((0, 2)), np.float64
        )


def sample_homography(
    rng: np.random.RandomState,
    image_size: Tuple[int, int],
    max_angle: float = 0.35,
    scale_range: Tuple[float, float] = (0.85, 1.2),
    max_translation: float = 0.08,
    max_perspective: float = 6e-4,
) -> np.ndarray:
    """Random pixel-space homography img1 -> img2 about the image center
    (the SuperPoint augmentation family: rotation x scale x translation x
    mild perspective). Returns [3, 3] float32."""
    Hh, Ww = image_size
    cx, cy = Ww / 2.0, Hh / 2.0
    to_c = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    a = rng.uniform(-max_angle, max_angle)
    s = rng.uniform(*scale_range)
    ca, sa = np.cos(a), np.sin(a)
    rs = np.array([[s * ca, -s * sa, 0], [s * sa, s * ca, 0], [0, 0, 1]])
    tx = rng.uniform(-max_translation, max_translation) * Ww
    ty = rng.uniform(-max_translation, max_translation) * Hh
    tr = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)
    p1, p2 = rng.uniform(-max_perspective, max_perspective, 2)
    pe = np.array([[1, 0, 0], [0, 1, 0], [p1, p2, 1]], np.float64)
    M = np.linalg.inv(to_c) @ tr @ pe @ rs @ to_c
    return (M / M[2, 2]).astype(np.float32)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def detector_loss(semi: jnp.ndarray, cells: jnp.ndarray) -> jnp.ndarray:
    """65-way cross entropy per 8x8 block (the SuperPoint detector loss)."""
    logp = jax.nn.log_softmax(semi, axis=-1)  # [B, Hc, Wc, 65]
    onehot = jax.nn.one_hot(cells, 65, dtype=semi.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def descriptor_loss(
    desc1: jnp.ndarray,   # [B, Hc, Wc, D]
    desc2: jnp.ndarray,
    H_mat: jnp.ndarray,   # [B, 3, 3] pixel homography img1 -> img2
    pos_margin: float = 1.0,
    neg_margin: float = 0.2,
    lambda_d: float = 250.0,
    cell: int = 8,
    hard_neg: int = 0,
) -> jnp.ndarray:
    """Dense hinge descriptor loss between a warped image pair
    (SuperPoint eq. 4): cells that correspond under H are positives.

    `hard_neg > 0` switches the negative term from the dense mean to the
    mean over each anchor cell's `hard_neg` HARDEST negatives (highest
    similarity among non-corresponding cells, both matching directions).
    Motivation (round 5, experiments/r5_frozen_qsched appendix): at the
    production point ~55% of mutual-NN matches are CONFIDENT
    descriptor-aliased pairs from repeated texture — under the dense
    mean each such negative is diluted by ~Hc*Wc easy ones whose hinge
    is already zero, so the gradient pressure on exactly the pairs that
    produce outlier matches is ~1/N of the signal. Top-k mining keeps
    the loss batched and MXU-friendly (one [B,N,N] similarity + two
    static top_k calls), static-shaped, and reduces to the dense form
    at hard_neg=0 (the default, SuperPoint-parity behavior)."""
    B, Hc, Wc, D = desc1.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(Hc, dtype=desc1.dtype), jnp.arange(Wc, dtype=desc1.dtype),
        indexing="ij",
    )
    centers = jnp.stack(
        [xs * cell + cell / 2, ys * cell + cell / 2, jnp.ones_like(xs)], -1
    ).reshape(-1, 3)  # [Hc*Wc, 3]
    warped = jnp.einsum("bij,nj->bni", H_mat, centers)
    warped = warped[..., :2] / (warped[..., 2:3] + 1e-9)  # [B, N, 2]
    c2 = centers[:, :2]  # [N, 2]
    # Correspondence indicator: warped center of cell i within half a cell of
    # cell j's center.
    d2 = jnp.sum(
        (warped[:, :, None, :] - c2[None, None, :, :]) ** 2, axis=-1
    )  # [B, N, N]
    s = (d2 <= (cell / 2.0) ** 2).astype(desc1.dtype)

    d1 = desc1.reshape(B, -1, D)
    d2f = desc2.reshape(B, -1, D)
    dot = jnp.einsum("bnd,bmd->bnm", d1, d2f)
    pos = jnp.maximum(0.0, pos_margin - dot)
    neg = jnp.maximum(0.0, dot - neg_margin)
    if hard_neg <= 0:
        loss = lambda_d * s * pos + (1.0 - s) * neg
        return jnp.mean(loss)
    # Hard-negative mining: positives keep the dense weighting; the
    # negative term averages each anchor's top-k hardest non-positives,
    # mined along BOTH directions (rows: img1 anchors, cols: img2).
    k = min(int(hard_neg), s.shape[-1])
    neg_masked = jnp.where(s > 0, -jnp.inf, neg)  # exclude positives
    row_top = jax.lax.top_k(neg_masked, k)[0]                  # [B, N, k]
    col_top = jax.lax.top_k(
        jnp.swapaxes(neg_masked, -1, -2), k
    )[0]                                                       # [B, N, k]
    hard = jnp.concatenate([row_top, col_top], axis=-1)
    hard = jnp.where(jnp.isfinite(hard), hard, 0.0)  # all-positive rows
    pos_term = jnp.sum(lambda_d * s * pos) / (jnp.sum(s) + 1e-9)
    return pos_term + jnp.mean(hard)


# ---------------------------------------------------------------------------
# Train steps
# ---------------------------------------------------------------------------


def make_detector_train_step(net: SuperPointNet, tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            outs = net.apply(p, batch["image"][..., None])
            return detector_loss(outs["semi"], batch["cells"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_detector_train_step_bn(net, tx: optax.GradientTransformation):
    """Detector train step for BatchNorm nets (SuperPointNetGauss2): BN
    runs in batch-stat mode (train=True) with the running statistics
    threaded through the step as part of the variables dict."""

    @jax.jit
    def step(variables, opt_state, batch):
        stats = variables.get("batch_stats", {})

        def loss_fn(p):
            outs, new_vars = net.apply(
                {"params": p, "batch_stats": stats},
                batch["image"][..., None],
                train=True,
                mutable=["batch_stats"],
            )
            return (
                detector_loss(outs["semi"], batch["cells"]),
                new_vars["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])
        updates, opt_state = tx.update(
            grads, opt_state, variables["params"]
        )
        params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": params, "batch_stats": new_stats},
            opt_state,
            loss,
        )

    return step


def freeze_batch_stats_grads(grads):
    """Zero the 'batch_stats' subtree of a gradient pytree.

    In inference-mode BN the outputs genuinely depend on the running
    mean/var, so autodiff produces REAL gradients for them — but they
    are buffers, not parameters (torch optimizers never touch BN
    buffers), and letting Adam walk them corrupts the statistics and
    can drive `var` toward 0 (rsqrt blowup). Called by every train step
    that differentiates a full variables dict."""
    if isinstance(grads, dict) and "batch_stats" in grads:
        grads = dict(grads)
        grads["batch_stats"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["batch_stats"]
        )
    return grads


def make_joint_sp_train_step(
    net: SuperPointNet, tx: optax.GradientTransformation,
    desc_weight: float = 1e-4, hard_neg: int = 0,
):
    """Detector CE on image 1 + dense descriptor loss across the warped pair."""

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            o1 = net.apply(p, batch["image"][..., None])
            o2 = net.apply(p, batch["image2"][..., None])
            l_det = detector_loss(o1["semi"], batch["cells"])
            l_desc = descriptor_loss(o1["desc"], o2["desc"], batch["H"],
                                     hard_neg=hard_neg)
            return l_det + desc_weight * l_desc, (l_det, l_desc)

        (loss, (l_det, l_desc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = freeze_batch_stats_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "det": l_det, "desc": l_desc}

    return step


def make_warped_joint_train_step(
    net: SuperPointNet, tx: optax.GradientTransformation,
    desc_weight: float = 1e-4, hard_neg: int = 0,
):
    """Joint detector+descriptor step where the second view is produced by
    warping the batch with per-item homographies INSIDE the jitted step
    (one vmapped bilinear warp on device — the round-1 joint run did this
    eagerly per item through the device tunnel and was ~1000x slower).

    batch: {'image' [B,H,W], 'cells' [B,Hc,Wc], 'cells2' [B,Hc,Wc],
            'H' [B,3,3] pixel homography img1 -> img2}.
    """
    from ..utils.warp import transform_image

    @jax.jit
    def step(params, opt_state, batch):
        H_mat = batch["H"]
        # transform_image computes out(x) = img(M @ x); for img1 -> img2
        # correspondence H, the resampling matrix is H^-1.
        img2 = jax.vmap(transform_image)(
            batch["image"][..., None], jnp.linalg.inv(H_mat)
        )[..., 0]

        def loss_fn(p):
            o1 = net.apply(p, batch["image"][..., None])
            o2 = net.apply(p, img2[..., None])
            l_det = detector_loss(o1["semi"], batch["cells"]) + detector_loss(
                o2["semi"], batch["cells2"]
            )
            l_desc = descriptor_loss(o1["desc"], o2["desc"], H_mat,
                                     hard_neg=hard_neg)
            return l_det + desc_weight * l_desc, (l_det, l_desc)

        (loss, (l_det, l_desc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = freeze_batch_stats_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "det": l_det, "desc": l_desc}

    return step


def homographic_adaptation(
    net: SuperPointNet,
    params,
    images: jnp.ndarray,          # [B, H, W] grayscale in [0, 1]
    H_mats: jnp.ndarray,          # [K, 3, 3] sampled homographies (img->warp)
) -> jnp.ndarray:
    """Aggregated detector heatmap over K homographic views (the SuperPoint
    homographic-adaptation label-refinement step, run to create
    pseudo-ground-truth keypoints on unlabeled real images).

    For each homography H_k: warp the image, run the detector, unwarp the
    heatmap back, and average over views with a validity mask (pixels that
    fell outside the warped frame don't vote). Fully batched and jittable:
    one vmapped bilinear warp per view, lax.scan over views.

    Returns [B, H, W] aggregated heatmaps in [0, 1].
    """
    from ..utils.warp import transform_image

    from .superpoint import flatten_detection

    B, Hh, Ww = images.shape
    ones = jnp.ones((Hh, Ww, 1), images.dtype)

    def one_view(carry, H_k):
        acc, cnt = carry
        H_inv = jnp.linalg.inv(H_k)
        # warped(x) = image(H_k^-1 x)  <=>  points map by H_k.
        warped = jax.vmap(lambda im: transform_image(im, H_inv))(
            images[..., None]
        )
        valid_w = transform_image(ones, H_inv)[..., 0]  # same for all B
        outs = net.apply(params, warped)
        heat = flatten_detection(outs["semi"])  # [B, H, W]
        # Unwarp back to the original frame: heat_orig(x) = heat(H_k x).
        heat0 = jax.vmap(lambda hm: transform_image(hm[..., None], H_k))(
            heat
        )[..., 0]
        valid0 = transform_image(valid_w[..., None], H_k)[..., 0]
        mask = (valid0 > 0.5).astype(heat0.dtype)
        return (acc + heat0 * mask, cnt + mask), None

    (acc, cnt), _ = jax.lax.scan(
        one_view,
        (jnp.zeros_like(images), jnp.zeros_like(images)),
        H_mats,
    )
    return acc / jnp.maximum(cnt, 1.0)


def heatmap_to_cells(
    heatmap: np.ndarray, conf_thresh: float = 0.015, nms_dist: int = 4
) -> np.ndarray:
    """Aggregated heatmap [H, W] -> 65-way cell labels [H/8, W/8] (the
    pseudo-label half of homographic adaptation): NMS, threshold, then the
    strongest keypoint per 8x8 cell wins; empty cells get the dustbin."""
    import jax.numpy as jnp_  # device NMS, host argmax bookkeeping

    from .process import nms_heatmap

    hm = np.asarray(nms_heatmap(jnp_.asarray(heatmap)[None], nms_dist)[0])
    Hh, Ww = hm.shape
    Hc, Wc = Hh // 8, Ww // 8
    lab = np.full((Hc, Wc), 64, np.int32)
    best = np.zeros((Hc, Wc), np.float32)
    ys, xs = np.nonzero(hm > conf_thresh)
    for y, x in zip(ys, xs):
        cy, cx = y // 8, x // 8
        if cy < Hc and cx < Wc and hm[y, x] > best[cy, cx]:
            best[cy, cx] = hm[y, x]
            lab[cy, cx] = (y % 8) * 8 + (x % 8)
    return lab


def warp_labels(
    corners: np.ndarray, H_mat: np.ndarray, image_size: Tuple[int, int]
) -> np.ndarray:
    """Warp keypoint labels by a homography and drop out-of-bounds points
    (parity: datasets/data_tools.warpLabels :37) — the label half of
    homographic adaptation."""
    Hh, Ww = image_size
    if len(corners) == 0:
        return corners
    pts_h = np.concatenate([corners, np.ones((len(corners), 1))], axis=1)
    w = pts_h @ H_mat.T
    w = w[:, :2] / (w[:, 2:3] + 1e-12)
    ok = (w[:, 0] >= 0) & (w[:, 0] < Ww) & (w[:, 1] >= 0) & (w[:, 1] < Hh)
    return w[ok].astype(np.float32)
