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

from ..ops.fields import cell_values, interior_mask, gather_facet_contribs
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


def tentative_facet_patch_build(geom, star, c, alpha=1.0, upwind=True):
    """Overlapping facet-pair additive-Schwarz patches for M - c f_impl.

    For every interior facet, the 2x2 cell-block patch
        [[D_plus, -c K01], [-c K10, D_minus]]
    (D = full cell diagonal blocks) is factorised in block-Schur form — the
    per-cell inverse D^{-1} is computed once and shared by the three patches
    containing each cell, and only the nu x nu facet Schur complement is
    inverted per facet (4x less LU work/workspace than inverting the full
    2nu x 2nu patch).  This resolves the O(alpha/h) normal-jump penalty
    couplings that make plain block Jacobi/Gauss-Seidel degrade under mesh
    refinement — the TPU-native analogue of the reference's ILU
    preconditioner (hdg_imex.py:224-228).

    Returns (Dinv (nc,nu,nu), B (nf,nu,nu), CD0inv (nf,nu,nu),
             Sinv (nf,nu,nu), weights (nc,)).
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
    S = D[c1] - jnp.einsum(
        "fij,fjk,fkl->fil", C, Dinv[c0], B
    )
    # boundary facets: minus block unused; make the Schur factor the identity
    msk = interior_mask(geom, 1)[:, None, None]
    eye = jnp.broadcast_to(jnp.eye(nu, dtype=D.dtype), S.shape)
    S = jnp.where(msk > 0, S, eye)
    Sinv = batched_inv(S)

    # only Dinv and Sinv are retained; the cross couplings B = -c K01 and
    # C = -c K10 are re-applied matrix-free from the facet tabulations at
    # apply time (keeps the per-stage tables at 2 x (n, nu, nu) instead of 5)
    return Dinv, Sinv


def _cross_apply(geom, star, c, alpha, upwind, y, transpose_sides):
    """Matrix-free application of the cross-coupling block to (nf, d1, 2).

    transpose_sides=False: apply B = -c K01 (plus-test rows, minus-side y);
    transpose_sides=True:  apply C = -c K10 (minus-test rows, plus-side y).
    """
    _, star_n = star
    d1 = geom.d1
    Ta = geom.tphi1[geom.ftab[:, 1 if transpose_sides else 0]]
    Tb = geom.tphi1[geom.ftab[:, 0 if transpose_sides else 1]]
    w = geom.flen[:, None] * geom.wqf[None, :]
    msk = interior_mask(geom)
    upw = jnp.abs(star_n) if upwind else 0.0
    scal = ((0.5 * star_n if transpose_sides else -0.5 * star_n) + upw) * msk
    pen = (geom.hF_inv[:, None] * alpha) * msk
    yq = jnp.einsum("fqj,fja->fqa", Tb, y)  # trial values at facet quadrature
    yn = jnp.einsum("fqa,fa->fq", yq, geom.normal)
    integrand = scal[..., None] * yq + (pen * yn)[..., None] * geom.normal[:, None, :]
    return (-c) * jnp.einsum("fq,fqi,fqa->fia", w, Ta, integrand)


def tentative_facet_patch_apply(geom, star, c, alpha, upwind, patches, r):
    """Apply the additive-Schwarz facet-patch preconditioner to (nc, d1, 2).

    Per interior facet, solve the 2x2 block system via the precomputed Schur
    factors:  y1 = Sinv (r1 - C D0inv r0);  y0 = D0inv (r0 - B y1).
    """
    Dinv, Sinv = patches
    nc, d1, _ = r.shape
    nu = 2 * d1
    rf = r.reshape(nc, nu)
    c0 = geom.fcells[:, 0]
    c1 = geom.fcells[:, 1]
    r0 = rf[c0]
    msk = interior_mask(geom, 1)[:, None]
    r1 = rf[c1] * msk
    D0r0 = jnp.einsum("fij,fj->fi", Dinv[c0], r0)
    Cd = _cross_apply(
        geom, star, c, alpha, upwind, D0r0.reshape(-1, d1, 2), True
    ).reshape(-1, nu)
    t = r1 - Cd
    y1 = jnp.einsum("fij,fj->fi", Sinv, t) * msk
    By1 = _cross_apply(
        geom, star, c, alpha, upwind, y1.reshape(-1, d1, 2), False
    ).reshape(-1, nu)
    y0 = jnp.einsum("fij,fj->fi", Dinv[c0], r0 - By1)
    out = gather_facet_contribs(geom, y0, y1)
    return (out / 3.0).reshape(nc, d1, 2)


def block_apply_cells(blocks_inv, r):
    """Apply per-cell inverse blocks to a velocity residual (nc, d1, 2)."""
    nc, d1, _ = r.shape
    out = jnp.einsum("cij,cj->ci", blocks_inv, r.reshape(nc, -1))
    return out.reshape(nc, d1, 2)
