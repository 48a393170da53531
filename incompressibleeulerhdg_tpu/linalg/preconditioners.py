"""Preconditioners and assembled operators for the matrix-free Krylov solvers.

- TentativeOperator: the per-stage tentative velocity operator M - c f_impl
  assembled into batch-last dense blocks (own-cell D + facet cross blocks),
  applied as a block SpMV and preconditioned by overlapping facet-pair
  additive Schwarz in block-Schur form — the TPU-native replacement for the
  GMRES+ILU tentative solver of the reference (hdg_imex.py:224-228)
- facet-block Jacobi for the condensed trace system (the default when the
  GTMG two-level scheme of linalg/gtmg.py is not supplied)
- cell-block Jacobi fallback for the tentative operator
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fields import interior_mask
from .smallinv import batched_inv, gauss_jordan_inv_bl

_register_tentative_op = partial(
    jax.tree_util.register_dataclass,
    data_fields=["D", "Bx", "Cx", "Dinv", "Sinv", "Dinv0"],
    meta_fields=[],
)


def _register_tentative_op_wrap(cls):
    return _register_tentative_op(dataclass(cls))

# facet-factor builds chunk above this facet count (bounds padded transients)
FACET_CHUNK_THRESHOLD = 65536

__all__ = [
    "trace_block_jacobi",
    "tentative_block_jacobi_build",
    "block_apply_cells",
    "TentativeOperator",
    "build_tentative_operator",
    "tentative_operator_matvec",
    "tentative_patch_apply",
]


def trace_block_jacobi(cs):
    """Return a flat-vector preconditioner applying per-facet inverse diagonal
    blocks (batch-last storage)."""
    nt = cs.nt

    def M(v):
        lam = v.reshape(-1, nt).T  # (nt, nf)
        out = jnp.sum(cs.Sdiag_inv * lam[None, :, :], axis=1)
        return out.T.ravel()

    return M


def f_impl_own_blocks(geom, star, alpha=1.0, upwind=True, csl=slice(None)):
    """Own-cell (block-diagonal) part of ``f_impl(w, u, Q*)``.

    Returns (ncsl, d1, 2, d1, 2).  Derivation of the own-side facet
    coefficients (s = this cell's side, sgn = +1 plus / -1 minus):
        advective: +0.5 * sgn * (Q*+.n)      * delta_ab
        penalty:   -(alpha/h) n_a n_b        (both sides, and boundary)
        upwind:    -|Q*+.n|  * delta_ab      (interior only)

    :arg csl: static cell slice (per-stage builds are chunked to bound the
        batch-major padded transients)
    """
    star_coeff, star_n = star
    star_coeff = star_coeff[csl]
    star_q = jnp.einsum("qi,cia->cqa", geom.phi1, star_coeff)
    d1 = geom.d1
    ncs = star_q.shape[0]
    det = geom.det_jac[csl]
    jinv = geom.jac_inv[csl]
    # volume: -int phi_i (Q*.grad phi_j) dx
    gphys = jnp.einsum("qjb,cba->cqja", geom.gphi1, jinv)
    conv = jnp.einsum("cqd,cqjd->cqj", star_q, gphys)
    vol = -jnp.einsum("c,q,qi,cqj->cij", det, geom.wq, geom.phi1, conv)

    blocks = jnp.zeros((ncs, d1, 2, d1, 2), dtype=star_q.dtype)
    eye2 = jnp.eye(2, dtype=star_q.dtype)
    blocks = blocks + vol[:, :, None, :, None] * eye2[None, None, :, None, :]

    int_mask = interior_mask(geom)  # (nf, 1)
    cfsign = geom.cfsign[csl]
    for l in range(3):
        f = geom.cell_facets[csl, l]
        T = geom.tphi1[geom.cf_tab[csl, l]]  # (ncs, nqf, d1)
        n = geom.normal[f]  # (ncs, 2)
        w = geom.flen[f][:, None] * geom.wqf[None, :]  # (ncs, nqf)
        sn = star_n[f]  # (ncs, nqf)
        msk = int_mask[f]  # (ncs, 1)
        hinv = geom.hF_inv[f]

        # scalar (delta_ab) coefficient at quadrature points
        scal = (0.5 * cfsign[:, l : l + 1] * sn - (jnp.abs(sn) if upwind else 0.0)) * msk
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


def f_impl_cross_blocks(geom, star, alpha=1.0, upwind=True, fsl=slice(None)):
    """Cross-cell facet coupling blocks of ``f_impl`` per interior facet.

    Returns (K01, K10), each (nfsl, d1, 2, d1, 2): the coefficient of the
    minus (resp. plus) side trial function in the plus (resp. minus) side
    test rows.  From the facet integrands of f_impl (see f_impl_apply):
        K01:  -0.5 (Q*.n) I + (alpha/h) n (x) n + |Q*.n| I
        K10:  +0.5 (Q*.n) I + (alpha/h) n (x) n + |Q*.n| I
    integrated against T0_i T1_j (zero on boundary facets).

    :arg fsl: static facet slice (the per-stage build is chunked to bound
        the batch-major padded transients)
    """
    _, star_n = star
    star_n = star_n[fsl]
    d1 = geom.d1
    T0 = geom.tphi1[geom.ftab[fsl, 0]]  # (nfsl, nqf, d1)
    T1 = geom.tphi1[geom.ftab[fsl, 1]]
    w = geom.flen[fsl, None] * geom.wqf[None, :]
    msk = interior_mask(geom)[fsl]
    eye2 = jnp.eye(2, dtype=star_n.dtype)
    normal = geom.normal[fsl]
    nn = jnp.einsum("fa,fb->fab", normal, normal)

    upw = jnp.abs(star_n) if upwind else 0.0
    s01 = (-0.5 * star_n + upw) * msk  # scalar (delta_ab) part, test0-trial1
    s10 = (+0.5 * star_n + upw) * msk
    pen = (geom.hF_inv[fsl, None] * alpha) * msk  # n (x) n part, both

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
    Dinv0: jnp.ndarray  # (nu, nu, nf) Dinv gathered to each facet's plus cell
    # (gathered once per stage at build; a per-application gather along the
    # minor axis is strided and measured 7x slower than streaming reads)


def _bm(A, x):
    """Batch-last block matvec: (nu, nu, n) x (nu, n) -> (nu, n).

    einsum form: XLA fuses the multiply-reduce without materialising the
    table-sized (nu, nu, n) product temporary of the broadcast form.
    """
    return jnp.einsum("ijn,jn->in", A, x)


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
    dtype = star[0].dtype
    eye2 = jnp.eye(2, dtype=dtype)
    t = lambda A: jnp.transpose(A, (1, 2, 0))

    # cell-diagonal blocks built in static chunks: batch-major (chunk, nu, nu)
    # intermediates tile-pad ~6x in HBM; chunking bounds the transient peak
    # (full-size builds OOMed 256^2 k=2 from the padding alone)
    nc = geom.n_cells
    ncch = 8 if nc > FACET_CHUNK_THRESHOLD // 2 else 1
    cbounds = [round(i * nc / ncch) for i in range(ncch + 1)]
    D_chunks, Dinv_chunks = [], []
    for c0_, c1_ in zip(cbounds[:-1], cbounds[1:]):
        csl = slice(c0_, c1_)
        fblk = f_impl_own_blocks(geom, star, alpha, upwind, csl=csl).reshape(
            c1_ - c0_, nu, nu
        )
        massc = (
            geom.det_jac[csl, None, None, None, None]
            * geom.m1[None, :, None, :, None]
            * eye2[None, None, :, None, :]
        ).reshape(c1_ - c0_, nu, nu)
        Dc = massc - c * fblk
        Dc_bl = t(Dc)
        D_chunks.append(Dc_bl)
        Dinv_chunks.append(gauss_jordan_inv_bl(Dc_bl))
    D_bl = jnp.concatenate(D_chunks, axis=2)
    Dinv_bl = jnp.concatenate(Dinv_chunks, axis=2)

    nf = geom.n_facets
    n_chunks = 8 if nf > FACET_CHUNK_THRESHOLD else 1
    bounds = [round(i * nf / n_chunks) for i in range(n_chunks + 1)]
    eye = jnp.eye(nu, dtype=dtype)
    msk_all = interior_mask(geom, 1)
    Bs, Cs, Sinvs = [], [], []
    for f0, f1 in zip(bounds[:-1], bounds[1:]):
        fsl = slice(f0, f1)
        K01, K10 = f_impl_cross_blocks(geom, star, alpha, upwind, fsl=fsl)
        Bc = (-c) * K01.reshape(f1 - f0, nu, nu)  # plus-row, minus-col
        Cc = (-c) * K10.reshape(f1 - f0, nu, nu)  # minus-row, plus-col
        c0 = geom.fcells[fsl, 0]
        c1 = geom.fcells[fsl, 1]
        D1c = jnp.transpose(D_bl[:, :, c1], (2, 0, 1))
        Dinv0c = jnp.transpose(Dinv_bl[:, :, c0], (2, 0, 1))
        Sc = D1c - jnp.einsum("fij,fjk,fkl->fil", Cc, Dinv0c, Bc)
        # boundary facets: minus block unused; identity Schur factor
        mskc = msk_all[fsl][:, None, None]
        Sc = jnp.where(mskc > 0, Sc, jnp.broadcast_to(eye, Sc.shape))
        Bs.append(t(Bc))
        Cs.append(t(Cc))
        Sinvs.append(gauss_jordan_inv_bl(t(Sc)))
    Bx = jnp.concatenate(Bs, axis=2)
    Cx = jnp.concatenate(Cs, axis=2)
    Sinv = jnp.concatenate(Sinvs, axis=2)
    Dinv0 = Dinv_bl[:, :, geom.fcells[:, 0]]
    return TentativeOperator(
        D=D_bl, Bx=Bx, Cx=Cx, Dinv=Dinv_bl, Sinv=Sinv, Dinv0=Dinv0
    )


def _gather_sides(geom, u2):
    """Plus/minus cell rows of a (nc, nu) field, returned batch-last (nu, nf).

    Row gathers in batch-major layout (contiguous) followed by a transpose
    beat direct minor-axis gathers on batch-last data (strided) by ~7x.
    """
    msk = interior_mask(geom, 1)[:, None]
    u0 = u2[geom.fcells[:, 0]].T
    u1 = (u2[geom.fcells[:, 1]] * msk).T
    return u0, u1


def _assemble_cells(geom, z0, z1, nu):
    """Facet->cell assembly: batch-last (nu, nf) sides -> (nc, nu) sum.

    Row-slice gathers (each index fetches a contiguous nu-row): TPU gathers
    are efficient per-slice, catastrophic per-scalar.
    """
    z0m = z0.T  # (nf, nu)
    z1m = z1.T
    cf = geom.cell_facets
    a0 = z0m[cf]  # (nc, 3, nu)
    a1 = z1m[cf]
    sel = (geom.cfside == 0)[:, :, None]
    return jnp.where(sel, a0, a1).sum(axis=1)


def tentative_operator_matvec(geom, op, u):
    """Assembled-block application of M - c f_impl: (nc, d1, 2) -> same."""
    nc, d1, _ = u.shape
    nu = 2 * d1
    u2 = u.reshape(nc, nu)
    r = _bm(op.D, u2.T)  # (nu, nc)
    msk = interior_mask(geom, 1)[None, :]
    u0, u1 = _gather_sides(geom, u2)
    z0 = _bm(op.Bx, u1)  # contribution to plus-cell rows
    z1 = _bm(op.Cx, u0) * msk  # minus-cell rows (zero on boundary)
    out = r.T + _assemble_cells(geom, z0, z1, nu)
    return out.reshape(nc, d1, 2)


def tentative_patch_apply(geom, op, r):
    """Additive-Schwarz facet-patch preconditioner (batch-last tables).

    Per interior facet:  y1 = Sinv (r1 - C D0inv r0);  y0 = D0inv (r0 - B y1);
    partition-of-unity weight 1/3 (every cell sits in exactly 3 patches).
    """
    nc, d1, _ = r.shape
    nu = 2 * d1
    r2 = r.reshape(nc, nu)
    msk = interior_mask(geom, 1)[None, :]
    r0, r1 = _gather_sides(geom, r2)
    t = r1 - _bm(op.Cx, _bm(op.Dinv0, r0))
    y1 = _bm(op.Sinv, t) * msk
    y0 = _bm(op.Dinv0, r0 - _bm(op.Bx, y1))
    out = _assemble_cells(geom, y0, y1, nu)
    return (out / 3.0).reshape(nc, d1, 2)


def block_apply_cells(blocks_inv, r):
    """Apply per-cell inverse blocks to a velocity residual (nc, d1, 2)."""
    nc, d1, _ = r.shape
    out = jnp.einsum("cij,cj->ci", blocks_inv, r.reshape(nc, -1))
    return out.reshape(nc, d1, 2)
