"""TPU-native Nister 5-point minimal solver for the essential matrix.

The reference's headline eval baseline is OpenCV's 5-point RANSAC
(`dsac_tools/utils_opencv.py:129` — cv2.findEssentialMat + recoverPose);
our `eval/opencv_baseline.py` wraps cv2 on the host for parity, and this
module is the first-party on-device replacement: fully batched, static
shapes, no host round trips, vmappable inside the RANSAC hypothesis fan-out.

Method (Nister, "An efficient solution to the five-point relative pose
problem", PAMI 2004), re-shaped for TPU/XLA:

1. Nullspace: the 5x9 epipolar constraint matrix's 4 smallest right
   singular vectors via the 9x9 Gram eigendecomposition (`safe_eigh` — the
   same kernel as the 8-point path, ops/eigh.py). E = x E1 + y E2 + z E3 + E4.
2. The 10 cubic constraints (det E = 0, 2 E Eᵀ E − tr(E Eᵀ) E = 0) are
   expanded NUMERICALLY per sample: each polynomial in (x, y, z) is a dense
   [4, 4, 4] coefficient tensor and products are 3-D convolutions — no
   hand-derived 600-term expansion, and it all lives on-device.
3. Gauss-Jordan reduction of the 10x20 coefficient matrix (one batched
   `linalg.solve`), then Nister's row pairing gives a 3x3 matrix B(z) with
   polynomial entries whose determinant n(z) has degree 10.
4. Real roots of n(z): substitute z = tan(θ) and evaluate the HOMOGENEOUS
   form ñ(θ) = cos¹⁰(θ)·n(tan θ) (bounded, overflow-free in f32) on a
   uniform θ grid; bracket sign changes (up to 10) and bisect a fixed
   number of iterations — data-independent control flow, ideal under jit.
5. Back-substitute the homogeneous solution (x·cosθ, y·cosθ) from the
   B-rows and assemble E ∝ xc·E1 + yc·E2 + sinθ·E3 + cosθ·E4.

Returns all (≤10) real-root candidates with a validity mask; RANSAC-style
selection over candidates x hypotheses happens in `eval/ransac.ransac_e`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.eigh import safe_eigh

# Monomial order of Nister's 10x20 coefficient matrix (powers of x, y, z).
# First 10 columns are eliminated by Gauss-Jordan; the last 10 span
# [xz², xz, x, yz², yz, y, z³, z², z, 1].
_MONOMIALS = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


class FivePointCandidates(NamedTuple):
    E: jnp.ndarray      # [10, 3, 3] candidate essential matrices (||E||=1)
    valid: jnp.ndarray  # [10] bool — True where a real root was bracketed


def _conv3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Product of two trivariate polynomials as [4,4,4] coefficient
    tensors, truncated to total degree <= 3 (exact whenever the true
    product degree fits, which holds for every use below)."""
    c = jax.scipy.signal.convolve(a, b, mode="full")
    return c[:4, :4, :4]


def _nullspace_basis(x1n: jnp.ndarray, x2n: jnp.ndarray) -> jnp.ndarray:
    """[5,2]x[5,2] K-normalized correspondences -> E basis [4, 3, 3]
    (the 4 smallest right singular vectors of the 5x9 constraint matrix,
    via its 9x9 Gram matrix — one small batched eigh, no SVD)."""
    x1, y1 = x1n[:, 0], x1n[:, 1]
    x2, y2 = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(x1)
    Q = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )  # [5, 9]
    G = Q.T @ Q
    _, V = safe_eigh(G)          # ascending eigenvalues
    basis = V[:, :4].T           # [4, 9] — 4-dim (approximate) nullspace
    return basis.reshape(4, 3, 3)


def _entry_polys(Es: jnp.ndarray) -> jnp.ndarray:
    """E(x,y,z) = x E1 + y E2 + z E3 + E4 as 9 linear coefficient tensors
    [3, 3, 4, 4, 4] (indexed [i, j, px, py, pz])."""
    P = jnp.zeros((3, 3, 4, 4, 4), Es.dtype)
    P = P.at[:, :, 1, 0, 0].set(Es[0])
    P = P.at[:, :, 0, 1, 0].set(Es[1])
    P = P.at[:, :, 0, 0, 1].set(Es[2])
    P = P.at[:, :, 0, 0, 0].set(Es[3])
    return P


def _constraint_matrix(Es: jnp.ndarray) -> jnp.ndarray:
    """The 10x20 Nister coefficient matrix from the E basis [4, 3, 3]."""
    P = _entry_polys(Es)

    def pm(a, b):
        return _conv3(a, b)

    # det(E): cofactor expansion along the first row.
    det = (
        pm(P[0, 0], pm(P[1, 1], P[2, 2]) - pm(P[1, 2], P[2, 1]))
        - pm(P[0, 1], pm(P[1, 0], P[2, 2]) - pm(P[1, 2], P[2, 0]))
        + pm(P[0, 2], pm(P[1, 0], P[2, 1]) - pm(P[1, 1], P[2, 0]))
    )

    # A = E Eᵀ (degree 2), tr(A), then C = 2 A E − tr(A) E (degree 3).
    A = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(3):
            acc = jnp.zeros((4, 4, 4), Es.dtype)
            for j in range(3):
                acc = acc + pm(P[i, j], P[k, j])
            A[i][k] = acc
    trA = A[0][0] + A[1][1] + A[2][2]
    rows = [det]
    for i in range(3):
        for l in range(3):
            acc = jnp.zeros((4, 4, 4), Es.dtype)
            for k in range(3):
                acc = acc + pm(A[i][k], P[k, l])
            rows.append(2.0 * acc - pm(trA, P[i, l]))

    M = jnp.stack(
        [
            jnp.stack([r[px, py, pz] for (px, py, pz) in _MONOMIALS])
            for r in rows
        ]
    )  # [10, 20]
    return M


def _B_row_polys(Bred: jnp.ndarray):
    """Nister row pairing on the reduced matrix [10, 10] (columns
    [xz², xz, x, yz², yz, y, z³, z², z, 1]): rows <e>-z<f>, <g>-z<h>,
    <i>-z<j> give a 3x3 B(z) with x/y entries of degree 3 and constant
    entries of degree 4. Returns (bx [3,4], by [3,4], bc [3,5]) with
    coefficients ordered highest degree first."""
    bx, by, bc = [], [], []
    for hi, lo in ((4, 5), (6, 7), (8, 9)):
        e, f = Bred[hi], Bred[lo]
        bx.append(jnp.stack([-f[0], e[0] - f[1], e[1] - f[2], e[2]]))
        by.append(jnp.stack([-f[3], e[3] - f[4], e[4] - f[5], e[5]]))
        bc.append(
            jnp.stack([-f[6], e[6] - f[7], e[7] - f[8], e[8] - f[9], e[9]])
        )
    return jnp.stack(bx), jnp.stack(by), jnp.stack(bc)


def _homog_eval(coeffs: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray):
    """Homogeneous evaluation of p(z) = Σ a_k z^(d-k) at z = s/c:
    c^d p(s/c) = Σ a_k s^(d-k) c^k. coeffs [..., d+1]; s, c broadcast."""
    d = coeffs.shape[-1] - 1
    ks = jnp.arange(d + 1)
    sp = s[..., None] ** (d - ks)
    cp = c[..., None] ** ks
    return jnp.sum(coeffs * sp * cp, axis=-1)


def _det_b_homog(bx, by, bc, theta):
    """ñ(θ) = cos¹⁰(θ) · det B(tanθ) — every det-expansion term takes one
    x-column (deg 3), one y-column (deg 3) and one constant column (deg 4)
    entry, so the homogenization factor is uniformly cos^10."""
    s, c = jnp.sin(theta), jnp.cos(theta)
    xh = _homog_eval(bx, s[..., None], c[..., None])  # [..., 3]
    yh = _homog_eval(by, s[..., None], c[..., None])
    ch = _homog_eval(bc, s[..., None], c[..., None])
    return (
        xh[..., 0] * (yh[..., 1] * ch[..., 2] - yh[..., 2] * ch[..., 1])
        - yh[..., 0] * (xh[..., 1] * ch[..., 2] - xh[..., 2] * ch[..., 1])
        + ch[..., 0] * (xh[..., 1] * yh[..., 2] - xh[..., 2] * yh[..., 1])
    )


def five_point_candidates(
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    grid: int = 512,
    bisect_iters: int = 40,
) -> FivePointCandidates:
    """All real-root essential-matrix candidates of one 5-correspondence
    sample. x1n, x2n: [5, 2] K-normalized image coordinates."""
    dtype = x1n.dtype
    Es = _nullspace_basis(x1n, x2n)
    M = _constraint_matrix(Es)
    # Gauss-Jordan of [M₁₀ | M₂₀₋₁₀] -> reduced right block.
    Bred = jnp.linalg.solve(M[:, :10], M[:, 10:])
    bx, by, bc = _B_row_polys(Bred)

    # Bracket sign changes of ñ(θ) on a uniform grid over (-π/2, π/2).
    eps = jnp.asarray(1e-4, dtype)
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, grid)
    vals = _det_b_homog(bx, by, bc, thetas)  # [grid]
    sign = jnp.sign(vals)
    change = (sign[:-1] * sign[1:]) < 0  # [grid-1]
    # Up to 10 bracket indices, earliest first; invalid slots masked.
    score = change.astype(jnp.float32) * 1e6 - jnp.arange(grid - 1)
    _, idx = jax.lax.top_k(score, 10)
    valid = change[idx]

    lo = thetas[idx]
    hi = thetas[idx + 1]
    f_lo = _det_b_homog(bx, by, bc, lo)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = _det_b_homog(bx, by, bc, mid)
        take_lo = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo = jnp.where(take_lo, mid, lo)
        f_lo = jnp.where(take_lo, f_mid, f_lo)
        hi = jnp.where(take_lo, hi, mid)
        return lo, hi, f_lo

    lo, hi, _ = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi, f_lo))
    theta = 0.5 * (lo + hi)  # [10]
    s, c = jnp.sin(theta), jnp.cos(theta)

    # Homogeneous back-substitution: multiplying a B-row by cos⁴θ gives
    # c⁴(Bx·x + By·y + Bc) = xh·(x·c) + yh·(y·c) + ch = 0, so with
    # u = x·cosθ, v = y·cosθ solve [xh yh][u v]ᵀ = -ch (3 eqs, 2 unknowns,
    # normal equations) — bounded even for roots near ±π/2.
    xh = _homog_eval(bx, s[:, None], c[:, None])  # [10, 3]
    yh = _homog_eval(by, s[:, None], c[:, None])
    ch = _homog_eval(bc, s[:, None], c[:, None])
    Amat = jnp.stack([xh, yh], axis=-1)  # [10, 3, 2]
    rhs = -ch[..., None]                 # [10, 3, 1]
    AtA = jnp.swapaxes(Amat, -1, -2) @ Amat + 1e-12 * jnp.eye(2, dtype=dtype)
    uv = (jnp.linalg.solve(AtA, jnp.swapaxes(Amat, -1, -2) @ rhs))[..., 0]

    E = (
        uv[:, 0, None, None] * Es[0]
        + uv[:, 1, None, None] * Es[1]
        + s[:, None, None] * Es[2]
        + c[:, None, None] * Es[3]
    )
    nrm = jnp.linalg.norm(E.reshape(10, 9), axis=-1, keepdims=True)
    E = E / jnp.maximum(nrm, 1e-12)[..., None]
    valid = valid & jnp.all(jnp.isfinite(E.reshape(10, 9)), axis=-1)
    return FivePointCandidates(E=E, valid=valid)
