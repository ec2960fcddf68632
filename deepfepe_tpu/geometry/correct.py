"""Optimal correspondence correction onto a ground-truth epipolar geometry.

TPU-native replacement for the reference's `cv2.correctMatches` round trips in
the virtual-point machinery (dsac_tools/utils_misc.py:163-230:
`get_virt_x1x2_grid` / `get_virt_x1x2`): project a grid of "virtual"
correspondences exactly onto the gt F so that the F-loss
(`compute_epi_residual` on the corrected points) is zero for F = F_gt.

We solve the underlying constrained projection directly: minimize
‖x1−x1⁰‖² + ‖x2−x2⁰‖² subject to e(x1,x2) = x2ᵀFx1 = 0, by Newton iteration
on the KKT conditions (x = x⁰ − λ∇e(x), with λ from the constraint
linearized at the current iterate). This converges to the same
maximum-likelihood correction as Hartley–Sturm for the displacements involved
— without the 6th-degree polynomial root solve, so it stays batched,
jit-able, and differentiable. The first iteration is exactly the classic
Sampson correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import homo


def _constraint_and_grad(F, x1, x2):
    """e = x2ᵀFx1 and its gradients wrt the inhomogeneous x1, x2."""
    x1h, x2h = homo(x1), homo(x2)
    Fx1 = x1h @ jnp.swapaxes(F, -1, -2)  # [..., N, 3] = (F x1)ᵀ rows
    Ftx2 = x2h @ F                        # [..., N, 3] = (Fᵀ x2)ᵀ rows
    e = jnp.sum(x2h * Fx1, axis=-1)       # [..., N]
    return e, Ftx2[..., :2], Fx1[..., :2]  # (e, de/dx1, de/dx2)


def correct_matches(
    F: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    iters: int = 5,
    eps: float = 1e-12,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project correspondences onto x2ᵀ F x1 = 0 (cv2.correctMatches parity).

    KKT iteration anchored at the input points (see module docstring); the
    first step is the classic Sampson correction. Returns corrected (x1, x2),
    [..., N, 2] pixel coordinates.
    """

    def body(_, xs):
        x1k, x2k = xs
        e, g1, g2 = _constraint_and_grad(F, x1k, x2k)
        # Linearize the constraint at the iterate; solve for the multiplier of
        # the projection from the ORIGINAL points: x = x0 - lam * g.
        resid = e + jnp.sum(g1 * (x1 - x1k), axis=-1) + jnp.sum(
            g2 * (x2 - x2k), axis=-1
        )
        denom = jnp.sum(g1 * g1, axis=-1) + jnp.sum(g2 * g2, axis=-1) + eps
        lam = (resid / denom)[..., None]
        return x1 - lam * g1, x2 - lam * g2

    x1c, x2c = jax.lax.fori_loop(0, iters, body, (x1, x2))
    return x1c, x2c


def virtual_grid(image_size, step: float = 0.1, dtype=jnp.float32):
    """The 10x10 virtual-point pixel grid of utils_misc.get_virt_x1x2_grid :163.

    Returns (pts1_b, pts2_b), each [100, 2] (identical grids in both images).
    `image_size` is (H, W).
    """
    H, W = float(image_size[0]), float(image_size[1])
    r = jnp.arange(0.0, 1.0, step, dtype=dtype)
    xx, yy = jnp.meshgrid(r, r)  # matches np.meshgrid default (xy indexing)
    pts = jnp.stack([W * xx.ravel(), H * yy.ravel()], axis=-1)
    return pts, pts


def get_virtual_points(
    F_gt: jnp.ndarray, image_size, step: float = 0.1, iters: int = 8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Virtual gt-consistent correspondences (ref: utils_misc.get_virt_x1x2 :201).

    Returns homogeneous (pts1_virt, pts2_virt), each [..., 100, 3] pixel
    coords satisfying pts2ᵀ F_gt pts1 ≈ 0 — the supervision targets of the
    F-loss (train_good_utils.get_all_loss_DeepF :298).
    """
    p1_b, p2_b = virtual_grid(image_size, step, dtype=F_gt.dtype)
    batch_shape = F_gt.shape[:-2]
    p1 = jnp.broadcast_to(p1_b, batch_shape + p1_b.shape)
    p2 = jnp.broadcast_to(p2_b, batch_shape + p2_b.shape)
    x1c, x2c = correct_matches(F_gt, p1, p2, iters=iters)
    # NaN scrub, as in the reference (pts*_virt[np.isnan] = 0).
    x1c = jnp.nan_to_num(x1c)
    x2c = jnp.nan_to_num(x2c)
    return homo(x1c), homo(x2c)
