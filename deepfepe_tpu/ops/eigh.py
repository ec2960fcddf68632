"""Batched symmetric eigendecomposition with degenerate-safe gradients.

This is the TPU-native replacement for the reference's per-item `torch.svd`
loops (models/DeepFNet.py:219-240, dsac_tools/utils_F.py:132-240) and the CUDA
`torch-batch-svd` extension (models/DeepFNetSampleLoss.py:27). The weighted
8-point solve only ever needs the smallest right singular vector of the
constraint matrix X [N, 9]; we obtain it as the smallest eigenvector of the
9x9 Gram matrix G = XᵀX, which keeps the whole batch on-chip as one fused
einsum + small batched eigh instead of B serialized SVDs (the reference's
dominant hot loop, SURVEY.md §3.3).

`torch.svd`'s backward blows up when singular values are nearly degenerate —
the very reason the reference ships a NaN scrubber and a CPU fallback
(models/model_utils.py:5, DeepFNet.py:219-230). Here `safe_eigh` defines a
custom VJP with Lorentzian-broadened gap reciprocals
    F_ij = (λ_j - λ_i) / ((λ_j - λ_i)² + eps),
which equals the exact eigh VJP for well-separated spectra and degrades
gracefully (bounded) at degeneracies instead of producing NaN/Inf.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


DEFAULT_GAP_EPS = 1e-10


def _fix_eigvec_signs(V: jnp.ndarray) -> jnp.ndarray:
    """Deterministic sign: the largest-|.| component of each column is >= 0.

    Removes the eigenvector sign ambiguity so downstream features (the solver
    recurrence feeds the algebraic residual X·f back into the weight MLP) see
    a stable sign across steps. Gradient of the selection is zero (±1 const).
    """
    idx = jnp.argmax(jnp.abs(V), axis=-2, keepdims=True)  # [..., 1, k]
    pivot = jnp.take_along_axis(V, idx, axis=-2)  # [..., 1, k]
    sign = jnp.where(pivot < 0, -1.0, 1.0)
    return V * sign


import os

# Forward implementation: 'auto', 'xla' (QDWH eigh), 'jacobi' (vectorized
# cyclic Jacobi, ops.jacobi), or 'pallas' (the TPU kernel, 9x9 only).
# Selected per-call or globally via DEEPFEPE_EIGH_IMPL. 'auto' picks:
#   - 'pallas' on TPU for 9x9 at flattened batch >= PALLAS_MIN_BATCH
#     (tools/bench_eigh_shapes.py on v5e: 5.5x faster than Jacobi at the
#     sample-loss/RANSAC fan-out shapes 1600-4096, 2.8x at 16384);
#   - 'jacobi' otherwise (~10x faster than XLA eigh at the solver's small
#     batches, where XLA fuses the whole fixed-sweep schedule into one
#     program and the Pallas grid launch doesn't pay off).
DEFAULT_EIGH_METHOD = os.environ.get("DEEPFEPE_EIGH_IMPL", "auto")

PALLAS_MIN_BATCH = 256


def _resolve_method(A: jnp.ndarray, method: str) -> str:
    if method != "auto":
        return method
    batch = 1
    for s in A.shape[:-2]:
        batch *= s
    # jax.default_backend() is static at trace time; the axon tunnel
    # platform is TPU hardware under an experimental name.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if A.shape[-1] == 9 and on_tpu and batch >= PALLAS_MIN_BATCH:
        return "pallas"
    return "jacobi"


def _eigh_forward(A: jnp.ndarray, method: str):
    A = (A + jnp.swapaxes(A, -1, -2)) * 0.5
    method = _resolve_method(A, method)
    if method == "jacobi":
        from .jacobi import jacobi_eigh

        return jacobi_eigh(A)  # signs already fixed
    if method == "pallas" and A.shape[-1] == 9:
        from .pallas.eigh9_pallas import eigh9_pallas

        lead = A.shape[:-2]
        w, V = eigh9_pallas(A.reshape((-1, 9, 9)))
        return w.reshape(lead + (9,)), V.reshape(lead + (9, 9))
    w, V = jnp.linalg.eigh(A)
    return w, _fix_eigvec_signs(V)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def safe_eigh(
    A: jnp.ndarray,
    gap_eps: float = DEFAULT_GAP_EPS,
    method: str | None = None,
):
    """Eigendecomposition of symmetric [..., n, n]: returns (w, V), ascending.

    Forward is XLA's `eigh`, the vectorized Jacobi, or the Pallas 9x9 kernel
    (see `DEFAULT_EIGH_METHOD`); backward is the standard eigh VJP with
    clamped spectral-gap denominators (see module docstring). `A` is
    symmetrized before the solve so tiny asymmetries from upstream matmuls
    cannot leak in.
    """
    return _eigh_forward(A, method or DEFAULT_EIGH_METHOD)


def _safe_eigh_fwd(A, gap_eps, method):
    w, V = safe_eigh(A, gap_eps, method)
    return (w, V), (w, V)


def _safe_eigh_bwd(gap_eps, method, res, cotangents):
    w, V = res
    dw, dV = cotangents
    Vt = jnp.swapaxes(V, -1, -2)
    # Gap matrix with Lorentzian broadening; exactly 0 on the diagonal.
    gaps = w[..., None, :] - w[..., :, None]  # [..., i, j] = λ_j - λ_i
    Fmat = gaps / (gaps**2 + gap_eps)
    inner = Fmat * (Vt @ dV)
    dA = V @ (jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(dw) + inner) @ Vt
    dA = (dA + jnp.swapaxes(dA, -1, -2)) * 0.5
    return (dA,)


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)


def smallest_eigvec(A: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS):
    """Smallest eigenpair of symmetric [..., n, n] -> (λ_min [...], v [..., n])."""
    w, V = safe_eigh(A, gap_eps)
    return w[..., 0], V[..., :, 0]


def smallest_singular_vec_gram(
    X: jnp.ndarray, gap_eps: float = DEFAULT_GAP_EPS
) -> jnp.ndarray:
    """Smallest right singular vector of [..., N, k] via the kxk Gram matrix.

    One batched MXU einsum (XᵀX) + a tiny batched eigh — the speed-of-light
    formulation of the 8-point null-space solve on TPU.
    """
    # Accumulate in (at least) f32 on the MXU; keep f64 when the caller runs
    # the high-precision eval path.
    acc = jnp.promote_types(X.dtype, jnp.float32)
    G = jnp.einsum(
        "...ni,...nj->...ij", X, X, preferred_element_type=acc
    ).astype(X.dtype)
    _, v = smallest_eigvec(G, gap_eps)
    return v
