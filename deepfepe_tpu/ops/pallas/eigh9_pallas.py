"""Pallas TPU kernel: batched 9x9 symmetric eigendecomposition (Jacobi).

The speed-of-light formulation of the weighted-8-point null-space solve
(SURVEY.md §2.4): the batch is laid out as 81 rows x B lanes ([entry, batch]
struct-of-arrays), so every Jacobi rotation is a short sequence of
elementwise VPU ops on [lane]-vectors shared by the whole batch tile — no
per-matrix control flow, no MXU padding waste on 9x9 tiles, and the entire
fixed-sweep schedule is unrolled at compile time.

The kernel computes unsorted (eigenvalues, eigenvectors); sorting, sign
fixing, and the degenerate-safe VJP live in the thin JAX wrapper (shared
with ops.eigh.safe_eigh / ops.jacobi.jacobi_eigh, which is the kernel's
reference implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 9
N2 = N * N
_EPS = 1e-12


def _idx(i: int, j: int) -> int:
    return i * N + j


def _eigh9_kernel(g_ref, w_ref, v_ref, *, sweeps: int):
    # Load the 81 matrix-entry rows; each is a [T] vector over the batch.
    g0 = [g_ref[i, :] for i in range(N2)]
    one = jnp.ones_like(g0[0])
    zero = jnp.zeros_like(g0[0])
    v0 = [one if i == j else zero for i in range(N) for j in range(N)]

    def sweep(_, carry):
        g = list(carry[:N2])
        v = list(carry[N2:])
        for p in range(N - 1):
            for q in range(p + 1, N):
                app = g[_idx(p, p)]
                aqq = g[_idx(q, q)]
                apq = g[_idx(p, q)]
                small = jnp.abs(apq) <= _EPS * jnp.sqrt(
                    jnp.abs(app * aqq) + _EPS
                )
                tau = (aqq - app) / (2.0 * jnp.where(small, one, apq))
                t = jnp.sign(tau) / (
                    jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)
                )
                t = jnp.where(tau == 0.0, one, t)
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c
                c = jnp.where(small, one, c)
                s = jnp.where(small, zero, s)

                # Row rotation: rows p, q.
                for k in range(N):
                    gp = g[_idx(p, k)]
                    gq = g[_idx(q, k)]
                    g[_idx(p, k)] = c * gp - s * gq
                    g[_idx(q, k)] = s * gp + c * gq
                # Column rotation: cols p, q.
                for k in range(N):
                    gp = g[_idx(k, p)]
                    gq = g[_idx(k, q)]
                    g[_idx(k, p)] = c * gp - s * gq
                    g[_idx(k, q)] = s * gp + c * gq
                # Eigenvector accumulation: V <- V @ J.
                for k in range(N):
                    vp = v[_idx(k, p)]
                    vq = v[_idx(k, q)]
                    v[_idx(k, p)] = c * vp - s * vq
                    v[_idx(k, q)] = s * vp + c * vq
        return tuple(g) + tuple(v)

    carry = jax.lax.fori_loop(0, sweeps, sweep, tuple(g0) + tuple(v0))
    g = carry[:N2]
    v = carry[N2:]

    for i in range(N):
        w_ref[i, :] = g[_idx(i, i)]
    for i in range(N2):
        v_ref[i, :] = v[i]


@functools.partial(jax.jit, static_argnums=(1, 2))
def eigh9_pallas(
    A: jnp.ndarray, sweeps: int = 7, tile: int = 128
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric [B, 9, 9] -> (w [B, 9], V [B, 9, 9]),
    ascending eigenvalues, deterministic eigenvector signs."""
    assert A.shape[-2:] == (N, N), A.shape
    B = A.shape[0]
    Bp = max(tile, ((B + tile - 1) // tile) * tile)
    A_sym = (A + jnp.swapaxes(A, -1, -2)) * 0.5
    # [B, 81] -> [81, Bp]: entry-major, batch on lanes.
    flat = A_sym.reshape(B, N2).T
    flat = jnp.pad(flat, ((0, 0), (0, Bp - B)))

    grid = (Bp // tile,)
    w_flat, v_flat = pl.pallas_call(
        functools.partial(_eigh9_kernel, sweeps=sweeps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N2, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((N, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, Bp), A.dtype),
            jax.ShapeDtypeStruct((N2, Bp), A.dtype),
        ),
    )(flat)

    w = w_flat.T[:B]                      # [B, 9]
    V = v_flat.T[:B].reshape(B, N, N)     # [B, 9, 9]

    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    idx = jnp.argmax(jnp.abs(V), axis=-2, keepdims=True)
    pivot = jnp.take_along_axis(V, idx, axis=-2)
    V = V * jnp.where(pivot < 0, -1.0, 1.0)
    return w, V
