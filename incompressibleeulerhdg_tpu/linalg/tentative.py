"""Tentative (advective) velocity solve.

TPU-native equivalent of the reference's per-stage tentative velocity solver
(GMRES + ILU, rtol 1e-10; /root/reference/src/timesteppers/hdg_imex.py:223-255
and the in-loop solve of hdg_implicit.py:103-129).  The operator is

    a(u, w) = (w, u) - c * f_impl(w, u, Q*),    c = a_ii * dt

which couples neighbouring cells through the advective/penalty/upwind facet
terms.  The production path passes an assembled TentativeOperator (``op=``):
block-SpMV matvec + facet-pair Schwarz preconditioner, both built once per
stage.  Weak-form matvec with block-Jacobi or colored Gauss-Seidel remain as
reference/fallback paths.
"""

import jax.numpy as jnp

from ..ops.fields import mass_apply
from ..ops.forms import f_impl_apply
from .krylov import gmres
from .preconditioners import (
    tentative_block_jacobi_build,
    block_apply_cells,
    build_tentative_operator,
    tentative_operator_matvec,
    tentative_patch_apply,
    tentative_colored_apply,
)

__all__ = ["tentative_matvec", "tentative_solve"]


def tentative_matvec(geom, star, u, c, alpha=1.0, upwind=True):
    """Apply the tentative-velocity operator M - c * f_impl(., Q*)."""
    return mass_apply(geom, geom.m1, u) - c * f_impl_apply(geom, star, u, alpha, upwind)


def tentative_solve(
    geom,
    star,
    rhs,
    c,
    *,
    alpha=1.0,
    upwind=True,
    rtol=1.0e-10,
    restart=30,
    maxiter=200,
    blocks_inv=None,
    colors=None,
    n_colors=0,
    op=None,
    colored=True,
):
    """Solve (M - c f_impl) u = rhs.  Returns (u (nc, d1, 2), iters).

    Preconditioner: per-cell block Jacobi, or — when a cell coloring is
    provided — a colored block Gauss-Seidel sweep (the TPU-native analogue of
    the reference's ILU: on 2-colorable structured triangulations one sweep
    resolves all one-sided facet couplings exactly, keeping iteration counts
    mesh-independent where block Jacobi degrades like 1/h).
    """
    shape = rhs.shape
    if blocks_inv is None and op is None:
        blocks_inv = tentative_block_jacobi_build(geom, star, c, alpha, upwind)

    if op is not None:
        def matvec(v):
            return tentative_operator_matvec(geom, op, v.reshape(shape)).ravel()
    else:
        def matvec(v):
            return tentative_matvec(
                geom, star, v.reshape(shape), c, alpha, upwind
            ).ravel()

    if op is not None:
        if colored and geom.fcol_pos is not None:
            def M(v):
                return tentative_colored_apply(geom, op, v.reshape(shape)).ravel()
        else:
            def M(v):
                return tentative_patch_apply(geom, op, v.reshape(shape)).ravel()
    elif colors is None:
        def M(v):
            return block_apply_cells(blocks_inv, v.reshape(shape)).ravel()
    else:
        cmask = [
            (colors == k).astype(rhs.dtype)[:, None, None] for k in range(n_colors)
        ]

        def M(v):
            r = v.reshape(shape)
            z = jnp.zeros_like(r)
            for k in range(n_colors):
                resid = r if k == 0 else r - tentative_matvec(
                    geom, star, z, c, alpha, upwind
                )
                z = z + cmask[k] * block_apply_cells(blocks_inv, resid)
            return z.ravel()

    u, iters, _ = gmres(
        matvec, rhs.ravel(), M=M, rtol=rtol, restart=restart, maxiter=maxiter
    )
    return u.reshape(shape), iters
