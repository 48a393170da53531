"""Batched small-matrix inverses that work on TPU in every dtype.

TPU XLA only implements LuDecomposition for f32/c64, so ``jnp.linalg.inv`` on
float64 batches fails to compile on device.  For the small well-conditioned
element blocks used as preconditioners (mass + O(dt) advection, size 12-40),
we invert in float32 and recover full float64 accuracy with Newton-Schulz
iterations X <- X (2I - A X), which are pure batched matmuls (MXU-friendly):
each sweep squares the residual, so ~3 sweeps take the f32 inverse (~1e-7
error) to f64 roundoff.
"""

import jax
import jax.numpy as jnp

__all__ = ["batched_inv", "gauss_jordan_inv_bl"]


def gauss_jordan_inv_bl(A):
    """In-place Gauss-Jordan inverse of batch-LAST matrices (n, n, m).

    Unrolled over the n (<= ~40) pivot steps; every operation is a
    lane-parallel elementwise op on (n, m) rows, so it runs at memory speed
    on TPU where the LAPACK-style batched LU is orders of magnitude slower.
    No pivoting: intended for the diagonally-dominant preconditioner blocks
    (mass + penalty), whose factors only need preconditioner accuracy.

    The input is materialised through an optimization barrier: every pivot
    step reads all of A, and without the barrier XLA fuses (= recomputes)
    A's producer chain into each of the n steps — measured 6x slowdown of
    the whole operator build.  The pivot loop runs under ``fori_loop`` so the
    step body is compiled once, not n times (the unrolled form added tens of
    seconds of XLA time to the step compile).
    """
    A = jax.lax.optimization_barrier(A)
    n = A.shape[0]
    m = A.shape[2]

    def body(k, A):
        pivot = jax.lax.dynamic_index_in_dim(A, k, axis=0, keepdims=False)
        pivot_k = jax.lax.dynamic_index_in_dim(pivot, k, axis=0, keepdims=False)
        inv_p = 1.0 / pivot_k  # (m,)
        row_k = pivot * inv_p[None, :]  # (n, m)
        row_k = jax.lax.dynamic_update_index_in_dim(row_k, inv_p, k, axis=0)
        col = jax.lax.dynamic_slice_in_dim(A, k, 1, axis=1)[:, 0, :]  # (n, m)
        f = jax.lax.dynamic_update_index_in_dim(
            col, jnp.zeros((m,), A.dtype), k, axis=0
        )
        A = A - f[:, None, :] * row_k[None, :, :]
        A = jax.lax.dynamic_update_slice_in_dim(
            A, (-f * inv_p[None, :])[:, None, :], k, axis=1
        )
        new_row = jax.lax.dynamic_update_index_in_dim(row_k, inv_p, k, axis=0)
        return jax.lax.dynamic_update_index_in_dim(A, new_row, k, axis=0)

    return jax.lax.fori_loop(0, n, body, A)


def batched_inv(A, newton_steps=3):
    """Inverse of a batch of small matrices (..., n, n), TPU-safe for f64."""
    if A.dtype == jnp.float64:
        X = jnp.linalg.inv(A.astype(jnp.float32)).astype(jnp.float64)
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        for _ in range(newton_steps):
            X = X @ (2.0 * eye - A @ X)
        return X
    return jnp.linalg.inv(A)
