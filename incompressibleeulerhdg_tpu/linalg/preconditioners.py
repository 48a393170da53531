"""Preconditioners for the matrix-free Krylov solvers.

Round-1 set:
- facet-block Jacobi for the condensed trace system (upgraded to the
  GTMG-equivalent two-level scheme in linalg/gtmg.py)
- cell-block Jacobi for the DG tentative-velocity operator (the TPU-native
  replacement for the ILU preconditioner at hdg_imex.py:224-228: the DG
  advection operator is block-dominant, and batched dense block inverses are
  the natural TPU patch solver)
"""

import jax.numpy as jnp

from ..ops.fields import cell_values, interior_mask
from .smallinv import batched_inv

__all__ = ["trace_block_jacobi", "tentative_block_jacobi_build", "block_apply_cells"]


def trace_block_jacobi(cs):
    """Return a flat-vector preconditioner applying per-facet inverse diagonal blocks."""
    nt = cs.nt

    def M(v):
        lam = v.reshape(-1, nt)
        return jnp.einsum("fij,fj->fi", cs.Sdiag_inv, lam).ravel()

    return M


def f_impl_own_blocks(geom, star, alpha=1.0, upwind=True):
    """Own-cell (block-diagonal) part of ``f_impl(w, u, Q*)``.

    Returns (nc, d1, 2, d1, 2).  Derivation of the own-side facet
    coefficients (s = this cell's side, sgn = +1 plus / -1 minus):
        advective: +0.5 * sgn * (Q*+.n)      * delta_ab
        penalty:   -(alpha/h) n_a n_b        (both sides, and boundary)
        upwind:    -|Q*+.n|  * delta_ab      (interior only)
    """
    star_q, star_n = star
    d1 = geom.d1
    # volume: -int phi_i (Q*.grad phi_j) dx
    gphys = jnp.einsum("qjb,cba->cqja", geom.gphi1, geom.jac_inv)
    conv = jnp.einsum("cqd,cqjd->cqj", star_q, gphys)
    vol = -jnp.einsum("c,q,qi,cqj->cij", geom.det_jac, geom.wq, geom.phi1, conv)

    blocks = jnp.zeros((geom.n_cells, d1, 2, d1, 2), dtype=star_q.dtype)
    eye2 = jnp.eye(2, dtype=star_q.dtype)
    blocks = blocks + vol[:, :, None, :, None] * eye2[None, None, :, None, :]

    int_mask = interior_mask(geom)  # (nf, 1)
    for l in range(3):
        f = geom.cell_facets[:, l]
        T = geom.tphi1[geom.cf_tab[:, l]]  # (nc, nqf, d1)
        n = geom.normal[f]  # (nc, 2)
        w = geom.flen[f][:, None] * geom.wqf[None, :]  # (nc, nqf)
        sn = star_n[f]  # (nc, nqf)
        msk = int_mask[f]  # (nc, 1)
        hinv = geom.hF_inv[f]

        # scalar (delta_ab) coefficient at quadrature points
        scal = (0.5 * geom.cfsign[:, l : l + 1] * sn - (jnp.abs(sn) if upwind else 0.0)) * msk
        sblk = jnp.einsum("cq,cqi,cqj->cij", w * scal, T, T)
        blocks = blocks + sblk[:, :, None, :, None] * eye2[None, None, :, None, :]

        # penalty: -(alpha/h) n (x) n on interior and boundary alike
        pblk = jnp.einsum("cq,cqi,cqj->cij", w, T, T) * (-alpha * hinv)[:, None, None]
        nn = jnp.einsum("ca,cb->cab", n, n)
        blocks = blocks + pblk[:, :, None, :, None] * nn[:, None, :, None, :]
    return blocks


def tentative_block_jacobi_build(geom, star, c, alpha=1.0, upwind=True):
    """Inverse cell-diagonal blocks of the tentative operator M - c * f_impl.

    Returns (nc, 2*d1, 2*d1) inverse blocks (u dofs flattened as i*2+a).
    """
    d1 = geom.d1
    fblk = f_impl_own_blocks(geom, star, alpha, upwind).reshape(
        geom.n_cells, 2 * d1, 2 * d1
    )
    eye2 = jnp.eye(2, dtype=fblk.dtype)
    mass = (
        geom.det_jac[:, None, None, None, None]
        * geom.m1[None, :, None, :, None]
        * eye2[None, None, :, None, :]
    ).reshape(geom.n_cells, 2 * d1, 2 * d1)
    return batched_inv(mass - c * fblk)


def block_apply_cells(blocks_inv, r):
    """Apply per-cell inverse blocks to a velocity residual (nc, d1, 2)."""
    nc, d1, _ = r.shape
    out = jnp.einsum("cij,cj->ci", blocks_inv, r.reshape(nc, -1))
    return out.reshape(nc, d1, 2)
