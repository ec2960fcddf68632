"""Parametric image warps: fit, (de)parameterization, bilinear warping.

Port of `utils/warp.py` (`fit` :8, `vec2mtrx`/`mtrx2vec` :35-70,
`transformImage` :75 — grid_sample warping) in batched JAX; used by the
warp-based frontend evaluations and homographic-adaptation-style training.
Warp types: 'translation', 'similarity', 'affine', 'homography'.
"""

from __future__ import annotations

import jax.numpy as jnp


def fit_affine(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares affine warp mapping src -> dst, both [N, 2] -> [3, 3]."""
    X, Y = src[:, 0], src[:, 1]
    U, V = dst[:, 0], dst[:, 1]
    O = jnp.zeros_like(X)
    I = jnp.ones_like(X)
    A = jnp.concatenate(
        [
            jnp.stack([X, Y, I, O, O, O], axis=1),
            jnp.stack([O, O, O, X, Y, I], axis=1),
        ],
        axis=0,
    )
    b = jnp.concatenate([U, V], axis=0)
    p, *_ = jnp.linalg.lstsq(A, b)
    M = jnp.array(
        [[p[0], p[1], p[2]], [p[3], p[4], p[5]], [0.0, 0.0, 1.0]],
        dtype=src.dtype,
    )
    return M


_N_PARAMS = {"translation": 2, "similarity": 4, "affine": 6, "homography": 8}


def vec2mtrx(p: jnp.ndarray, warp_type: str = "homography") -> jnp.ndarray:
    """Warp parameters [..., k] -> matrices [..., 3, 3] (identity at p=0)."""
    O = jnp.zeros_like(p[..., 0])
    I = jnp.ones_like(O)
    if warp_type == "translation":
        tx, ty = p[..., 0], p[..., 1]
        rows = [[I, O, tx], [O, I, ty], [O, O, I]]
    elif warp_type == "similarity":
        pc, ps, tx, ty = (p[..., i] for i in range(4))
        rows = [[I + pc, -ps, tx], [ps, I + pc, ty], [O, O, I]]
    elif warp_type == "affine":
        p1, p2, p3, p4, p5, p6 = (p[..., i] for i in range(6))
        rows = [[I + p1, p2, p3], [p4, I + p5, p6], [O, O, I]]
    elif warp_type == "homography":
        p1, p2, p3, p4, p5, p6, p7, p8 = (p[..., i] for i in range(8))
        rows = [[I + p1, p2, p3], [p4, I + p5, p6], [p7, p8, I]]
    else:
        raise ValueError(warp_type)
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def mtrx2vec(M: jnp.ndarray, warp_type: str = "homography") -> jnp.ndarray:
    e = lambda i, j: M[..., i, j]
    if warp_type == "translation":
        return jnp.stack([e(0, 2), e(1, 2)], axis=-1)
    if warp_type == "similarity":
        return jnp.stack([e(0, 0) - 1, e(1, 0), e(0, 2), e(1, 2)], axis=-1)
    if warp_type == "affine":
        return jnp.stack(
            [e(0, 0) - 1, e(0, 1), e(0, 2), e(1, 0), e(1, 1) - 1, e(1, 2)],
            axis=-1,
        )
    if warp_type == "homography":
        return jnp.stack(
            [e(0, 0) - 1, e(0, 1), e(0, 2), e(1, 0), e(1, 1) - 1, e(1, 2),
             e(2, 0), e(2, 1)],
            axis=-1,
        )
    raise ValueError(warp_type)


def compose(p: jnp.ndarray, dp: jnp.ndarray, warp_type: str = "homography"):
    """Compose warp parameters: result applies dp after p."""
    M = vec2mtrx(dp, warp_type) @ vec2mtrx(p, warp_type)
    M = M / M[..., 2:3, 2:3]
    return mtrx2vec(M, warp_type)


def inverse(p: jnp.ndarray, warp_type: str = "homography"):
    return mtrx2vec(jnp.linalg.inv(vec2mtrx(p, warp_type)), warp_type)


def bilinear_sample(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at grid [..., 2] (x, y) pixel coords,
    zero-padded out of bounds (grid_sample equivalent)."""
    H, W, C = image.shape
    x, y = grid[..., 0], grid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def at(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xs = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        ys = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        v = image[ys, xs]
        return jnp.where(inb[..., None], v, 0.0)

    v = (
        at(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + at(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + at(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + at(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )
    return v


def transform_image(
    image: jnp.ndarray, M: jnp.ndarray
) -> jnp.ndarray:
    """Warp image [H, W, C] by the 3x3 warp M in pixel coordinates
    (output(x) = image(M @ x)). Ref: warp.transformImage :75."""
    H, W, _ = image.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=image.dtype),
        jnp.arange(W, dtype=image.dtype),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-1)  # [H, W, 3]
    warped = pts @ M.T
    grid = warped[..., :2] / (warped[..., 2:3] + 1e-8)
    return bilinear_sample(image, grid)
