"""Batched cyclic-Jacobi symmetric eigensolver (pure JAX, vectorized).

The algorithmic core of the Pallas 9x9 eigh kernel
(ops/pallas/eigh9_pallas.py), kept in plain jnp so it runs anywhere and
serves as the kernel's reference implementation. For n=9 the full
eigendecomposition is 36 rotations per sweep; each rotation is a handful of
elementwise ops on [B]-vectors, so the whole batch advances in lockstep on
the VPU with zero per-item control flow — the TPU-native replacement for the
reference's per-item `torch.svd` loop (models/DeepFNet.py:219-240).

Convergence: quadratic; `sweeps=7` drives off-diagonal mass to ~f32 eps for
n=9 (validated against numpy in tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rotate(G, V, p, q, eps):
    """One (p, q) Jacobi rotation applied across the whole batch.

    G: [..., n, n] symmetric; V: [..., n, n] accumulated eigenvectors.
    """
    app = G[..., p, p]
    aqq = G[..., q, q]
    apq = G[..., p, q]

    # Stable rotation angle (Golub & Van Loan alg. 8.4.1), guarded for
    # already-annihilated entries.
    small = jnp.abs(apq) <= eps * jnp.sqrt(jnp.abs(app * aqq) + eps)
    tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    cb = c[..., None]
    sb = s[..., None]
    # Row update: rows p and q of G.
    Gp = G[..., p, :]
    Gq = G[..., q, :]
    G = G.at[..., p, :].set(cb * Gp - sb * Gq)
    G = G.at[..., q, :].set(sb * Gp + cb * Gq)
    # Column update (keeps symmetry).
    Gp = G[..., :, p]
    Gq = G[..., :, q]
    G = G.at[..., :, p].set(cb * Gp - sb * Gq)
    G = G.at[..., :, q].set(sb * Gp + cb * Gq)
    # Eigenvector accumulation: V <- V @ J (columns p, q).
    Vp = V[..., :, p]
    Vq = V[..., :, q]
    V = V.at[..., :, p].set(cb * Vp - sb * Vq)
    V = V.at[..., :, q].set(sb * Vp + cb * Vq)
    return G, V


@partial(jax.jit, static_argnums=(1,))
def jacobi_eigh(A: jnp.ndarray, sweeps: int = 7, eps: float = 1e-12):
    """Full eigendecomposition of symmetric [..., n, n] -> (w, V) ascending.

    Deterministic fixed-sweep cyclic Jacobi; eigenvalues sorted ascending and
    eigenvector signs fixed as in ops.eigh._fix_eigvec_signs.
    """
    n = A.shape[-1]
    G = (A + jnp.swapaxes(A, -1, -2)) * 0.5
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

    def sweep(_, carry):
        G, V = carry
        for p in range(n - 1):
            for q in range(p + 1, n):
                G, V = _rotate(G, V, p, q, eps)
        return G, V

    # fori_loop keeps the compiled graph to one sweep (36 rotations for n=9)
    # instead of sweeps x 36 — compile time matters for the CPU test path.
    G, V = jax.lax.fori_loop(0, sweeps, sweep, (G, V))

    w = jnp.diagonal(G, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

    # Deterministic sign.
    idx = jnp.argmax(jnp.abs(V), axis=-2, keepdims=True)
    pivot = jnp.take_along_axis(V, idx, axis=-2)
    V = V * jnp.where(pivot < 0, -1.0, 1.0)
    return w, V
