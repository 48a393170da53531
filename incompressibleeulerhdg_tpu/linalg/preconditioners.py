"""Preconditioners for the matrix-free Krylov solvers.

Round-1 set:
- facet-block Jacobi for the condensed trace system (upgraded to the
  GTMG-equivalent two-level scheme in linalg/gtmg.py)
- cell-block Jacobi for the DG tentative-velocity operator (the TPU-native
  replacement for the ILU preconditioner at hdg_imex.py:224-228: the DG
  advection operator is block-dominant, and batched dense block inverses are
  the natural TPU patch solver)
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fields import cell_values, interior_mask, gather_facet_contribs
from .smallinv import batched_inv

_register_tentative_op = partial(
    jax.tree_util.register_dataclass,
    data_fields=["D", "Bx", "Cx", "Dinv", "Sinv"],
    meta_fields=[],
)


def _register_tentative_op_wrap(cls):
    return _register_tentative_op(dataclass(cls))

__all__ = ["trace_block_jacobi", "tentative_block_jacobi_build", "block_apply_cells"]


def trace_block_jacobi(cs):
    """Return a flat-vector preconditioner applying per-facet inverse diagonal
    blocks (batch-last storage)."""
    nt = cs.nt

    def M(v):
        lam = v.reshape(-1, nt).T  # (nt, nf)
        out = jnp.sum(cs.Sdiag_inv * lam[None, :, :], axis=1)
        return out.T.ravel()

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


def f_impl_cross_blocks(geom, star, alpha=1.0, upwind=True):
    """Cross-cell facet coupling blocks of ``f_impl`` per interior facet.

    Returns (K01, K10), each (nf, d1, 2, d1, 2): the coefficient of the minus
    (resp. plus) side trial function in the plus (resp. minus) side test rows.
    From the facet integrands of f_impl (see f_impl_apply):
        K01:  -0.5 (Q*.n) I + (alpha/h) n (x) n + |Q*.n| I
        K10:  +0.5 (Q*.n) I + (alpha/h) n (x) n + |Q*.n| I
    integrated against T0_i T1_j (zero on boundary facets).
    """
    _, star_n = star
    d1 = geom.d1
    T0 = geom.tphi1[geom.ftab[:, 0]]  # (nf, nqf, d1)
    T1 = geom.tphi1[geom.ftab[:, 1]]
    w = geom.flen[:, None] * geom.wqf[None, :]
    msk = interior_mask(geom)
    eye2 = jnp.eye(2, dtype=star_n.dtype)
    nn = jnp.einsum("fa,fb->fab", geom.normal, geom.normal)

    upw = jnp.abs(star_n) if upwind else 0.0
    s01 = (-0.5 * star_n + upw) * msk  # scalar (delta_ab) part, test0-trial1
    s10 = (+0.5 * star_n + upw) * msk
    pen = (geom.hF_inv[:, None] * alpha) * msk  # n (x) n part, both

    def build(Ta, Tb, scal):
        base = jnp.einsum("fq,fqi,fqj->fij", w * scal, Ta, Tb)
        out = base[:, :, None, :, None] * eye2[None, None, :, None, :]
        pblk = jnp.einsum("fq,fqi,fqj->fij", w * pen, Ta, Tb)
        out = out + pblk[:, :, None, :, None] * nn[:, None, :, None, :]
        return out

    K01 = build(T0, T1, s01)
    K10 = build(T1, T0, s10)
    return K01, K10


@_register_tentative_op_wrap
class TentativeOperator:
    """Assembled per-stage tentative operator M - c f_impl + its patch factors.

    All tables are stored BATCH-LAST, (nu, nu, n): the TPU tiles the two
    minormost dims to (8, 128), so batch-major (n, 20, 20) tables pad 6-25x
    in HBM; with the huge batch dim in the lanes the storage is exact and
    every application is a lane-parallel fused multiply-reduce.

    The Krylov matvec uses the SAME blocks as the Schwarz patches: assembling
    once per stage and applying dense blocks replaces re-deriving the weak
    form from tabulations per application (which built 25x-padded per-quad
    intermediates and dominated the step time).
    """

    D: jnp.ndarray  # (nu, nu, nc) own-cell blocks
    Bx: jnp.ndarray  # (nu, nu, nf) -c K01: plus-test rows, minus-side trial
    Cx: jnp.ndarray  # (nu, nu, nf) -c K10: minus-test rows, plus-side trial
    Dinv: jnp.ndarray  # (nu, nu, nc)
    Sinv: jnp.ndarray  # (nu, nu, nf) patch Schur inverses


def _bm(A, x):
    """Batch-last block matvec: (nu, nu, n) x (nu, n) -> (nu, n).

    Written as broadcast-multiply + reduce so XLA keeps the batch dimension
    in the lanes (a dot_general could transpose to batch-major layouts).
    """
    return jnp.sum(A * x[None, :, :], axis=1)


def build_tentative_operator(geom, star, c, alpha=1.0, upwind=True):
    """Assemble blocks + overlapping facet-pair Schwarz factors per stage.

    The 2x2 cell-block patch  [[D_plus, -c K01], [-c K10, D_minus]]  is
    factorised in block-Schur form: per-cell D^{-1} (shared by the three
    patches containing each cell) + per-facet nu x nu Schur inverse.  This
    resolves the O(alpha/h) normal-jump penalty couplings that make block
    Jacobi/Gauss-Seidel degrade under mesh refinement — the TPU-native
    analogue of the reference's ILU preconditioner (hdg_imex.py:224-228).
    """
    d1 = geom.d1
    nu = 2 * d1
    fblk = f_impl_own_blocks(geom, star, alpha, upwind).reshape(
        geom.n_cells, nu, nu
    )
    eye2 = jnp.eye(2, dtype=fblk.dtype)
    mass = (
        geom.det_jac[:, None, None, None, None]
        * geom.m1[None, :, None, :, None]
        * eye2[None, None, :, None, :]
    ).reshape(geom.n_cells, nu, nu)
    D = mass - c * fblk  # (nc, nu, nu)
    Dinv = batched_inv(D)

    K01, K10 = f_impl_cross_blocks(geom, star, alpha, upwind)
    B = (-c) * K01.reshape(geom.n_facets, nu, nu)  # plus-row, minus-col
    C = (-c) * K10.reshape(geom.n_facets, nu, nu)  # minus-row, plus-col

    c0 = geom.fcells[:, 0]
    c1 = geom.fcells[:, 1]
    S = D[c1] - jnp.einsum("fij,fjk,fkl->fil", C, Dinv[c0], B)
    # boundary facets: minus block unused; make the Schur factor the identity
    msk = interior_mask(geom, 1)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(nu, dtype=D.dtype), S.shape)
    S = jnp.where(msk > 0, S, eye)
    Sinv = batched_inv(S)

    t = lambda A: jnp.transpose(A, (1, 2, 0))
    return TentativeOperator(D=t(D), Bx=t(B), Cx=t(C), Dinv=t(Dinv), Sinv=t(Sinv))


def tentative_operator_matvec(geom, op, u):
    """Assembled-block application of M - c f_impl: (nc, d1, 2) -> same."""
    nc, d1, _ = u.shape
    nu = 2 * d1
    ut = u.reshape(nc, nu).T  # (nu, nc)
    r = _bm(op.D, ut)
    msk = interior_mask(geom, 1)[None, :]
    u0 = ut[:, geom.fcells[:, 0]]
    u1 = ut[:, geom.fcells[:, 1]] * msk
    z0 = _bm(op.Bx, u1)  # contribution to plus-cell rows
    z1 = _bm(op.Cx, u0) * msk  # minus-cell rows (zero on boundary)
    r = r + _assemble_cells_bl(geom, z0, z1)
    return r.T.reshape(nc, d1, 2)


def _assemble_cells_bl(geom, z0, z1):
    """Batch-last facet->cell assembly: (nu, nf) sides -> (nu, nc) sum."""
    cf = geom.cell_facets  # (nc, 3)
    sel = (geom.cfside == 0)[None, :, :]  # (1, nc, 3)
    a0 = z0[:, cf]  # (nu, nc, 3)
    a1 = z1[:, cf]
    return jnp.sum(jnp.where(sel, a0, a1), axis=2)


def tentative_patch_apply(geom, op, r):
    """Additive-Schwarz facet-patch preconditioner (batch-last tables).

    Per interior facet:  y1 = Sinv (r1 - C D0inv r0);  y0 = D0inv (r0 - B y1);
    partition-of-unity weight 1/3 (every cell sits in exactly 3 patches).
    """
    nc, d1, _ = r.shape
    nu = 2 * d1
    rt = r.reshape(nc, nu).T  # (nu, nc)
    c0 = geom.fcells[:, 0]
    c1 = geom.fcells[:, 1]
    msk = interior_mask(geom, 1)[None, :]
    r0 = rt[:, c0]
    r1 = rt[:, c1] * msk
    Dinv0 = op.Dinv[:, :, c0]
    t = r1 - _bm(op.Cx, _bm(Dinv0, r0))
    y1 = _bm(op.Sinv, t) * msk
    y0 = _bm(Dinv0, r0 - _bm(op.Bx, y1))
    out = _assemble_cells_bl(geom, y0, y1)
    return (out / 3.0).T.reshape(nc, d1, 2)


def block_apply_cells(blocks_inv, r):
    """Apply per-cell inverse blocks to a velocity residual (nc, d1, 2)."""
    nc, d1, _ = r.shape
    out = jnp.einsum("cij,cj->ci", blocks_inv, r.reshape(nc, -1))
    return out.reshape(nc, d1, 2)
